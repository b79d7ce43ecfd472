"""Second-session extras registry: the crawl-to-training pipeline stages
(URL canonicalization/dedup, training shuffle, BPE vocabulary, exact
substring dedup, HTML extraction, PageRank, the cur5 composition), engine
surfaces (profiling, MERGE upsert, z-order), and the multimodal decode
oracle pairs (SURVEY.md §2.11/§2.12 extensions).

Where the corpus lacks an input modality (URLs, HTML, media bytes), the
query derives it deterministically from doc_id with an INDEPENDENT
in-query writer and the oracle predicts the production operator's output
analytically — honest end-to-end checks without synthesizing input files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tulflow_spark.functions import canonicalize_url, canonicalize_url_sql
from tulflow_spark.io import table
from tulflow_spark.plans import register

# deterministic messy-URL derivation, identical Spark/DuckDB: odd doc_ids
# get tracking params + uppercase host + default port, even ones are clean —
# so every (doc_id div 2) pair collides post-canonicalization (a pair never
# straddles a doc_id div 10 subdomain boundary: the crossing is odd->even).
_URL_SQL = (
    "CASE WHEN doc_id % 2 = 1 THEN "
    "'HTTPS://D' || CAST(doc_id // 10 AS VARCHAR) || '.Example.COM:443/docs/' "
    "|| CAST(doc_id // 2 AS VARCHAR) || '/?utm_source=feed&b=2&a=1#sec' "
    "ELSE 'https://d' || CAST(doc_id // 10 AS VARCHAR) || '.example.com/docs/' "
    "|| CAST(doc_id // 2 AS VARCHAR) || '?a=1&b=2' END"
)


def _url_col() -> F.Column:
    half = (F.col("doc_id") / 2).cast("long").cast("string")
    sub = (F.col("doc_id") / 10).cast("long").cast("string")
    messy = F.concat(
        F.lit("HTTPS://D"),
        sub,
        F.lit(".Example.COM:443/docs/"),
        half,
        F.lit("/?utm_source=feed&b=2&a=1#sec"),
    )
    clean = F.concat(
        F.lit("https://d"),
        sub,
        F.lit(".example.com/docs/"),
        half,
        F.lit("?a=1&b=2"),
    )
    return F.when(F.col("doc_id") % 2 == 1, messy).otherwise(clean)


@register(
    "url1_canonical_dedup",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, {canonicalize_url_sql(_URL_SQL)} AS canonical_url
      FROM documents
    )
    SELECT canonical_url,
           COUNT(*) AS n_dups,
           MIN(doc_id) AS keep_doc_id
    FROM urls
    GROUP BY canonical_url
    HAVING COUNT(*) > 1
    """,
)
def url1_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup of a crawl: canonicalize (lowercase host, strip
    default port, drop utm_*/fbclid/gclid, sort params, drop fragment,
    trailing-slash) then keep the smallest doc_id per canonical URL.

    100 TB shape: canonicalization is pure map-side JVM column algebra (no
    UDF anywhere — regexp/array built-ins); the groupBy shuffles only
    (canonical_url, doc_id) pairs, never document bodies.  Every odd/even
    doc-id pair collides by construction, exercising all the rules at once.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", canonicalize_url(_url_col()).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


@register(
    "tr1_train_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(substr(md5(CAST(doc_id AS VARCHAR) || ':shuffle-epoch-0'), 1, 2)
                AS VARCHAR) AS bucket,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY substr(md5(CAST(doc_id AS VARCHAR) || ':shuffle-epoch-0'), 1, 2)
             ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuffle-epoch-0'), doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
)
def tr1_train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data export: every epoch
    seed induces a reproducible pseudo-random total order (md5 of
    id+seed), realized as 256 hash buckets each sorted internally.

    100 TB shape: this is how you shuffle a trillion documents WITHOUT a
    global sort — the bucket is a map-side column, the window sorts within
    buckets only (256-way parallel, no single-partition window), and the
    training reader concatenates buckets in name order for the full
    permutation.  Seed change ⇒ completely different order, same engine
    plan.  (A plain ``ORDER BY rand()`` is neither reproducible nor
    resumable; md5-of-id is both.)
    """
    docs = table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle-epoch-0")))
    w = (
        Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    )
    return (
        docs.select(
            "doc_id",
            key.alias("shuffle_key"),
            F.substring(key, 1, 2).alias("bucket"),
        )
        .withColumn("shuffle_rank", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "bucket", "shuffle_rank")
    )


@register("tx12_bpe_merges")
def tx12_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE vocabulary: train 16 merges on the documents corpus and
    return the ordered merge table (rank, left, right).

    No SQL oracle exists for an iterative trainer (rows-only driver check);
    exactness is pinned by tests/test_bpe.py, where the distributed trainer
    reproduces an independent single-process implementation of the
    published algorithm merge-for-merge, and determinism is total-order
    tie-broken so any partitioning yields the same table."""
    from tulflow_spark.ext.bpe import bpe_train

    docs = table(spark, sf_dir, "documents")
    merges = bpe_train(docs, 16, checkpoint_every=8)
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string",
    )


@register(
    "dd10_repeated_spans",
    oracle=None,  # set below: built by repeated_spans_sql for n=8
)
def dd10_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022 shape): every maximal token
    span whose 8-token windows all occur >= 2 times corpus-wide — the
    distributed windowed-hash equivalent of their suffix-array pass.
    Window hashing and span interval-merge are pure JVM column algebra;
    only (hash, doc, pos) triples shuffle.  See ext/substring.py."""
    from tulflow_spark.ext.substring import repeated_spans

    return repeated_spans(
        table(spark, sf_dir, "documents"), n=8, min_count=2
    )


# the oracle is programmatic (shared n/min_count constants with the query)
from tulflow_spark.ext.substring import repeated_spans_sql as _rs_sql  # noqa: E402
from tulflow_spark.plans import EXTRA_ORACLE as _EO, ORACLE as _O, GATED as _G  # noqa: E402

(_O if "dd10_repeated_spans" in _G else _EO)["dd10_repeated_spans"] = _rs_sql(8, 2)


@register("pr1_profile_lineitem")
def pr1_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile of lineitem (nulls / exact distinct /
    min/max per column) — the ANALYZE-TABLE surface.  One scan, one wide
    map-side-combinable aggregate, unpivoted to a row per column; see
    operators/profile.py for the HLL scale variant."""
    from tulflow_spark.operators.profile import profile_table

    return profile_table(
        table(spark, sf_dir, "lineitem"),
        ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
         "l_linestatus", "l_shipdate"],
    )


from tulflow_spark.operators.profile import profile_sql as _pr_sql  # noqa: E402

(_O if "pr1_profile_lineitem" in _G else _EO)["pr1_profile_lineitem"] = _pr_sql(
    "lineitem",
    [("l_orderkey", True), ("l_quantity", True), ("l_extendedprice", True),
     ("l_returnflag", False), ("l_linestatus", False), ("l_shipdate", False)],
)


@register(
    "cdc2_merge_upsert",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey, 'D' AS op,
             CAST(NULL AS VARCHAR) AS o_orderstatus,
             CAST(NULL AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 101 = 0
      UNION ALL
      SELECT o_orderkey, 'U', 'U', o_totalprice + 10.0
      FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey % 101 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'I', 'N', 1.0
      FROM orders WHERE o_orderkey % 103 = 0
    ),
    merged AS (
      SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
      FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders) b
      WHERE NOT EXISTS (SELECT 1 FROM changes c
                        WHERE c.o_orderkey = b.o_orderkey)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM changes WHERE op <> 'D'
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
             AS total_price,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM merged GROUP BY o_orderstatus
    """,
)
def cdc2_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO (CDC apply): a deterministic keyed change set
    (deletes %101, updates %97, inserts %103 with shifted keys) applied to
    orders via operators/cdc.py::merge_upsert — anti-join + union, no
    window — then rolled up so the oracle hash pins every merge rule
    (delete keys vanish from counts, update rows carry the new status and
    +10 price, insert keys extend max_key past 10M)."""
    from tulflow_spark.functions import dsum
    from tulflow_spark.operators.cdc import merge_upsert

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    deletes = o.filter(F.col("o_orderkey") % 101 == 0).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    updates = o.filter(
        (F.col("o_orderkey") % 97 == 0) & (F.col("o_orderkey") % 101 != 0)
    ).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
    )
    inserts = o.filter(F.col("o_orderkey") % 103 == 0).select(
        (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    merged = merge_upsert(o, changes, keys=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@register("zo1_zorder_layout")
def zo1_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering quality over lineitem (l_partkey, l_suppkey):
    bucket by 10-bit z-prefix and report per-bucket bounding boxes — the
    pure-JVM Morton interleave whose tight boxes drive two-dimensional
    file skipping after a repartitionByRange(zvalue) write.  See
    operators/zorder.py."""
    from tulflow_spark.operators.zorder import zorder_layout

    return zorder_layout(
        table(spark, sf_dir, "lineitem"), "l_partkey", "l_suppkey"
    )


from tulflow_spark.operators.zorder import zvalue_sql as _zv_sql  # noqa: E402

(_O if "zo1_zorder_layout" in _G else _EO)["zo1_zorder_layout"] = f"""
    SELECT ({_zv_sql('l_partkey', 'l_suppkey')} >> 22) AS zbucket,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS min_x, MAX(l_partkey) AS max_x,
           MIN(l_suppkey) AS min_y, MAX(l_suppkey) AS max_y
    FROM lineitem GROUP BY zbucket
"""


@register("zo2_zorder3_layout")
def zo2_zorder3_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-dimensional Morton clustering quality (zvalue_n, the n-dim
    generalization of zo1): lineitem keyed by (l_partkey, l_suppkey,
    l_orderkey % 256), bucketed by z-prefix with per-bucket bounding
    boxes on all three dims — the layout a three-predicate workload
    would write.  Pure JVM bit algebra, mirrored term-for-term in SQL."""
    from tulflow_spark.operators.zorder import zvalue_n

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("bigint").alias("x"),
        F.col("l_suppkey").cast("bigint").alias("y"),
        (F.col("l_orderkey") % 256).cast("bigint").alias("w"),
    )
    # zvalue_n's default 16-bit budget: silent truncation would quietly
    # destroy the clustering this query demonstrates — guard IN the
    # expression (rides the existing scan, no extra eager job); the
    # oracle mirrors raw values, and the branch is value-neutral when no
    # key violates the budget
    def _guarded(c):
        return F.when(
            F.col(c) < F.lit(1 << 16), F.col(c)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"zo2: {c}="), F.col(c).cast("string"),
                    F.lit(" exceeds the 16-bit z budget"),
                )
            ).cast("bigint")
        ).alias(c)

    li = li.select(_guarded("x"), _guarded("y"), _guarded("w"))
    z = zvalue_n(["x", "y", "w"])
    return (
        li.withColumn("zbucket", F.shiftright(z, 24))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.min("y").alias("min_y"), F.max("y").alias("max_y"),
            F.min("w").alias("min_w"), F.max("w").alias("max_w"),
        )
    )


from tulflow_spark.operators.zorder import zvalue_n_sql as _zvn_sql  # noqa: E402

(_O if "zo2_zorder3_layout" in _G else _EO)["zo2_zorder3_layout"] = f"""
    WITH keyed AS (
      SELECT l_partkey AS x, l_suppkey AS y, l_orderkey % 256 AS w
      FROM lineitem
    )
    SELECT ({_zvn_sql(['x', 'y', 'w'])} >> 24) AS zbucket,
           COUNT(*) AS n_rows,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y,
           MIN(w) AS min_w, MAX(w) AS max_w
    FROM keyed GROUP BY zbucket
"""


@register(
    "tx13_html_extract",
    oracle="""
    SELECT doc_id,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           regexp_replace(trim(text), '\\s+', ' ', 'g') AS text,
           CAST(2 AS INT) AS n_links
    FROM documents
    """,
)
def tx13_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction round-trip, oracle-checked end to end: wrap
    each document's text in deterministic markup (title, nav links, a
    script block that must NOT leak into the text), run the REAL stdlib
    extractor (ext/html.py, Arrow-batched mapInPandas), and compare
    against the analytically-predicted output — title recovered, script
    dropped, body text whitespace-normalized, both links counted."""
    from tulflow_spark.ext.html import extract_text

    docs = table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><script>var skip_me = 1;</script></head><body>"
              "<a href='/a'></a><a href='/b'></a><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    wrapped = docs.select("doc_id", html.alias("html"))
    out = extract_text(wrapped, "html", "doc_id")
    return out.select(
        "doc_id", "title", "text", F.size("links").alias("n_links")
    )


_PG_NODES = "SELECT doc_id AS node FROM documents"
_PG_EDGES = """
  SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT COUNT(*) FROM documents) AS dst
  FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 2) % (SELECT COUNT(*) FROM documents)
  FROM documents
"""


@register("pg1_pagerank", oracle=None)  # oracle attached below (programmatic)
def pg1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 synchronous iterations, d=0.85) over a deterministic
    2-out-regular link graph derived from doc_ids (the shape ext/html.py's
    link extraction feeds at crawl scale).  One edge-sized shuffle per
    iteration; decimal-exact contribution sums make the double ranks
    hash-equal to the DuckDB unrolled-CTE mirror."""
    from tulflow_spark.ext.pagerank import pagerank

    docs = table(spark, sf_dir, "documents")
    nodes = docs.select(F.col("doc_id").alias("node"))
    n = F.lit(docs.count())
    e1 = docs.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 7 + 1) % n).alias("dst")
    )
    e2 = docs.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 13 + 2) % n).alias("dst")
    )
    return pagerank(e1.unionByName(e2), nodes, n_iter=3)


from tulflow_spark.ext.pagerank import pagerank_sql as _pg_sql  # noqa: E402

(_O if "pg1_pagerank" in _G else _EO)["pg1_pagerank"] = _pg_sql(
    _PG_NODES, _PG_EDGES, "SELECT COUNT(*) FROM documents", n_iter=3
)


from tulflow_spark.ext.substring import repeated_spans_sql as _rs_sql2  # noqa: E402

_CUR5_ORACLE = f"""
    WITH extracted AS (
      -- HTML wrap + real-parser extraction collapses to whitespace
      -- normalization for markup-free bodies (pinned by tx13)
      SELECT doc_id,
             regexp_replace(trim(text), '\\s+', ' ', 'g') AS text
      FROM documents
    ),
    url_keep AS (
      -- url1 semantics: keep the smallest doc_id per canonical URL; the
      -- derivation collides exactly the (doc_id // 2) pairs → even ids
      SELECT doc_id, text FROM extracted
      WHERE doc_id IN (
        SELECT MIN(doc_id) FROM extracted GROUP BY doc_id // 2
      )
    ),
    exact_keep AS (
      SELECT doc_id, text FROM url_keep
      WHERE doc_id IN (
        SELECT MIN(doc_id) FROM url_keep GROUP BY md5(text)
      )
    ),
    spans AS ({_rs_sql2(8, 2, source="exact_keep")}),
    tok AS (
      SELECT doc_id, t[i] AS tok, i AS pos
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM exact_keep),
           UNNEST(range(1, len(t) + 1)) AS r(i)
    ),
    cut AS (
      SELECT tok.doc_id,
             COALESCE(STRING_AGG(tok.tok, ' ' ORDER BY tok.pos)
               FILTER (WHERE NOT EXISTS (
                 SELECT 1 FROM spans s
                 WHERE s.doc_id = tok.doc_id
                   AND tok.pos - 1 >= s.span_start
                   AND tok.pos - 1 < s.span_end
               )), '') AS text
      FROM tok GROUP BY tok.doc_id
    )
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)
             AS n_tokens,
           md5(text) AS text_md5
    FROM cut
    WHERE trim(text) <> '' AND len(string_split_regex(trim(text), '\\s+')) >= 10
"""


@register("cur5_web_pipeline", oracle=None)
def cur5_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl-curation story as ONE oracle-checked composition:

    HTML extract (REAL stdlib parser over deterministic markup)
      → URL canonical dedup (keep smallest doc_id per canonical URL)
      → exact dedup (keep smallest doc_id per md5(text))
      → exact-substring cut (maximal repeated 8-token spans removed)
      → quality floor (≥ 10 surviving tokens).

    Every stage is the production operator (ext/html.py, functions
    .canonicalize_url, ext/substring.py) — no stage is re-implemented for
    the test — and the DuckDB oracle mirrors the pipeline stage by stage,
    so the final (doc_id, n_tokens, md5(text)) hash pins all five stages
    composed.  At 100 TB the stages chain map-side except the three keyed
    shuffles (url group, hash group, span hash group)."""
    from tulflow_spark.ext.html import extract_text
    from tulflow_spark.ext.substring import cut_spans, repeated_spans

    docs = table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><script>var skip_me = 1;</script></head><body>"
              "<a href='/a'></a><a href='/b'></a><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    extracted = extract_text(
        docs.select("doc_id", html.alias("html")), "html", "doc_id"
    ).select("doc_id", "text")

    w_url = Window.partitionBy("curl")
    url_keep = (
        extracted.select(
            "doc_id", "text", canonicalize_url(_url_col()).alias("curl")
        )
        .withColumn("_keep", F.min("doc_id").over(w_url))
        .filter(F.col("doc_id") == F.col("_keep"))
        .select("doc_id", "text")
    )

    w_hash = Window.partitionBy(F.md5("text"))
    exact_keep = (
        url_keep.withColumn("_keep", F.min("doc_id").over(w_hash))
        .filter(F.col("doc_id") == F.col("_keep"))
        .select("doc_id", "text")
    )
    # exact_keep fans out (span mining AND span cutting consume it);
    # materialize so the Python HTML-parse stage upstream runs once,
    # not once per consumer (ext.curation._materialize doctrine)
    exact_keep = exact_keep.localCheckpoint(eager=True)

    spans = repeated_spans(exact_keep, n=8, min_count=2)
    cut = cut_spans(exact_keep, spans)
    toks = F.split(F.trim("text"), r"\s+")
    return (
        cut.filter(F.trim("text") != "")
        .select(
            "doc_id",
            F.size(toks).cast("int").alias("n_tokens"),
            F.md5("text").alias("text_md5"),
        )
        .filter(F.col("n_tokens") >= 10)
    )


(_O if "cur5_web_pipeline" in _G else _EO)["cur5_web_pipeline"] = _CUR5_ORACLE


@register(
    "mm1_media_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(2 + doc_id % 7 AS INT) AS width,
           CAST(2 + doc_id % 5 AS INT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_px
    FROM documents
    """,
)
def mm1_media_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode path, oracle-checked end to end: synthesize a
    real 24-bit BMP per row (independent in-query writer — struct.pack,
    4-byte row padding), run the PRODUCTION decoder
    (ext.media_codecs.decode_image) in the same Arrow batch, and emit the
    decoded dimensions and mean pixel — all analytically predictable from
    doc_id, so the driver's hash pins the binary-column plumbing AND the
    decoder.  Bytes never leave the mapInPandas stage (the multimodal
    doctrine)."""
    import struct as _struct
    from collections.abc import Iterator

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tulflow_spark.ext.media_codecs import decode_image

        def make_bmp(w: int, h: int, v: int) -> bytes:
            row = bytes([v, v, v] * w)
            row += b"\x00" * ((4 - len(row) % 4) % 4)
            px = row * h
            header_size = 14 + 40
            bmp = b"BM" + _struct.pack(
                "<IHHI", header_size + len(px), 0, 0, header_size
            )
            bmp += _struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0
            )
            return bmp + px

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, v = 2 + d % 7, 2 + d % 5, d % 256
                img = decode_image(make_bmp(w, h, v))
                ih, iw = img.shape[:2]
                rows.append(
                    {
                        "doc_id": d,
                        "width": iw,
                        "height": ih,
                        "mean_px": float(np.mean(img)),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen, schema="doc_id bigint, width int, height int, mean_px double"
    )


@register(
    "mm2_png_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(2 + doc_id % 5 AS INT) AS width,
           CAST(2 + doc_id % 4 AS INT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_px
    FROM documents
    """,
)
def mm2_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG decode path oracle-checked: in-query chunk-level PNG writer
    (zlib-deflated unfiltered scanlines, CRC32 — independent of the
    decoder's inflate+defilter path) → production ``decode_image`` →
    analytically-predicted dims and mean."""
    import struct as _struct
    import zlib as _zlib
    from collections.abc import Iterator

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tulflow_spark.ext.media_codecs import decode_image

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                _struct.pack(">I", len(body)) + tag + body
                + _struct.pack(">I", _zlib.crc32(tag + body))
            )

        def make_png(w: int, h: int, v: int) -> bytes:
            ihdr = _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
            raw = b"".join(b"\x00" + bytes([v] * w) for _ in range(h))
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, v = 2 + d % 5, 2 + d % 4, d % 256
                img = decode_image(make_png(w, h, v))
                rows.append(
                    {
                        "doc_id": d,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "mean_px": float(np.mean(img)),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen, schema="doc_id bigint, width int, height int, mean_px double"
    )


@register(
    "mm3_wav_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(800 + doc_id % 400 AS BIGINT) AS n_samples,
           CAST((800 + doc_id % 400) * 1000 // 8000 AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def mm3_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM-WAV decode path oracle-checked: stdlib ``wave`` writer in-query
    → production ``decode_audio`` → exact sample counts / rate / duration
    (all integers, analytically predicted)."""
    import io as _io
    import wave as _wave
    from collections.abc import Iterator

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.ext.media_codecs import decode_audio

        def make_wav(n: int, v: int) -> bytes:
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(v.to_bytes(2, "little", signed=True) * n)
            return buf.getvalue()

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 800 + d % 400
                samples, rate = decode_audio(make_wav(n, d % 1000))
                rows.append(
                    {
                        "doc_id": d,
                        "sample_rate": rate,
                        "n_samples": len(samples),
                        "duration_ms": len(samples) * 1000 // rate,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id bigint, sample_rate int, n_samples bigint, "
               "duration_ms bigint",
    )


@register(
    "mm4_mp3_probe",
    oracle="""
    SELECT doc_id,
           CAST(10 + doc_id % 30 AS INT) AS n_frames,
           CAST(44100 AS INT) AS sample_rate,
           CAST((10 + doc_id % 30) * 1152 * 1000 // 44100 AS BIGINT)
             AS duration_ms
    FROM documents
    """,
)
def mm4_mp3_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 frame-walk probe oracle-checked: in-query MPEG1 Layer III
    frame writer (spec header fields + the 144·kbps/rate+padding length
    formula — independent of the probe's walk) → production ``probe_mp3``
    → exact frame count / rate / duration."""
    import struct as _struct
    from collections.abc import Iterator

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.ext.mediaprobe import probe_mp3

        def make_mp3(n: int, pad_every: int) -> bytes:
            out = bytearray()
            for i in range(n):
                padding = 1 if pad_every and i % pad_every == 0 else 0
                hdr = (0x7FF << 21 | 0x3 << 19 | 0x1 << 17 | 0x1 << 16
                       | 9 << 12  # 128 kbps (index 9, MPEG1 L3)
                       | 0 << 10  # 44100 Hz
                       | padding << 9)
                frame_len = 144 * 128 * 1000 // 44100 + padding
                out += _struct.pack(">I", hdr) + b"\x00" * (frame_len - 4)
            return bytes(out)

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 10 + d % 30
                info = probe_mp3(make_mp3(n, pad_every=2 + d % 3))
                rows.append(
                    {
                        "doc_id": d,
                        "n_frames": info.n_frames,
                        "sample_rate": info.sample_rate,
                        "duration_ms": info.duration_ms,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id bigint, n_frames int, sample_rate int, "
               "duration_ms bigint",
    )


@register(
    "mm5_ogg_id3_probe",
    oracle="""
    SELECT doc_id,
           'vorbis' AS codec,
           CAST(44100 AS INT) AS sample_rate,
           CAST((44100 + doc_id * 100) * 1000 // 44100 AS BIGINT)
             AS ogg_duration_ms,
           'Title ' || CAST(doc_id AS VARCHAR) AS id3_title
    FROM documents
    """,
)
def mm5_ogg_id3_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg page-walk + ID3v2 tag probes oracle-checked: in-query RFC-3533
    page writer (granule positions, lacing) and ID3v2.3 frame writer —
    both independent of the probes' parsers — through the production
    ``probe_ogg`` / ``parse_id3v2``."""
    import struct as _struct
    from collections.abc import Iterator

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.ext.mediaprobe import parse_id3v2, probe_ogg

        def page(granule: int, seq: int, payload: bytes, htype: int = 0) -> bytes:
            segs = []
            rest = len(payload)
            while rest >= 255:
                segs.append(255)
                rest -= 255
            segs.append(rest)
            return (b"OggS" + bytes([0, htype]) + _struct.pack("<q", granule)
                    + _struct.pack("<I", 7) + _struct.pack("<I", seq)
                    + b"\x00" * 4 + bytes([len(segs)]) + bytes(segs) + payload)

        def make_ogg(total_samples: int) -> bytes:
            ident = (b"\x01vorbis" + _struct.pack("<I", 0) + bytes([2])
                     + _struct.pack("<I", 44100) + b"\x00" * 16 + b"\x01")
            return (page(0, 0, ident, htype=2)
                    + page(total_samples, 1, b"\x00" * 16, htype=4))

        def make_id3(title: str) -> bytes:
            body = b"\x03" + title.encode("utf-8")
            frame = b"TIT2" + _struct.pack(">I", len(body)) + b"\x00\x00" + body
            n = len(frame)
            size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                          (n >> 7) & 0x7F, n & 0x7F])
            return b"ID3\x03\x00\x00" + size + frame

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                og = probe_ogg(make_ogg(44100 + d * 100))
                tags = parse_id3v2(make_id3(f"Title {d}"))
                rows.append(
                    {
                        "doc_id": d,
                        "codec": og.codec,
                        "sample_rate": og.sample_rate,
                        "ogg_duration_ms": og.duration_ms,
                        "id3_title": tags["TIT2"],
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id bigint, codec string, sample_rate int, "
               "ogg_duration_ms bigint, id3_title string",
    )


@register(
    "mm6_mp4_probe",
    oracle="""
    SELECT doc_id,
           CAST(5 + doc_id % 20 AS INT) AS n_frames,
           CAST((5 + doc_id % 20) * 40 AS BIGINT) AS duration_ms,
           CAST(16 * (1 + doc_id % 40) AS INT) AS width,
           'fram' AS codec
    FROM documents
    """,
)
def mm6_mp4_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-BMFF probe oracle-checked: compact in-query box writer (ftyp +
    moov with mvhd/tkhd/mdhd/hdlr/stbl sample tables — independent byte
    layout, not the probe's parser) → production ``probe_mp4`` → exact
    frame count / duration / dimensions / sample-entry fourcc."""
    import struct as _struct
    from collections.abc import Iterator

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.ext.mediaprobe import probe_mp4

        def box(tag: bytes, body: bytes) -> bytes:
            return _struct.pack(">I", 8 + len(body)) + tag + body

        def full(tag: bytes, body: bytes) -> bytes:
            return box(tag, b"\x00\x00\x00\x00" + body)

        def make_mp4(n: int, w: int, h: int) -> bytes:
            dur = n * 40
            mat = _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
            mvhd = full(b"mvhd", _struct.pack(">II", 0, 0)
                        + _struct.pack(">II", 1000, dur)
                        + _struct.pack(">I", 0x10000) + b"\x00" * 14 + mat
                        + b"\x00" * 24 + _struct.pack(">I", 2))
            tkhd = full(b"tkhd", _struct.pack(">II", 0, 0)
                        + _struct.pack(">II", 1, 0) + _struct.pack(">I", dur)
                        + b"\x00" * 8 + _struct.pack(">hhhh", 0, 0, 0, 0)
                        + mat + _struct.pack(">II", w << 16, h << 16))
            mdhd = full(b"mdhd", _struct.pack(">II", 0, 0)
                        + _struct.pack(">II", 1000, dur)
                        + _struct.pack(">HH", 0x55C4, 0))
            hdlr = full(b"hdlr", _struct.pack(">I", 0) + b"vide"
                        + b"\x00" * 12 + b"p\x00")
            entry = box(b"fram", b"\x00" * 6 + _struct.pack(">H", 1)
                        + b"\x00" * 70)
            stbl = box(b"stbl",
                       full(b"stsd", _struct.pack(">I", 1) + entry)
                       + full(b"stts", _struct.pack(">III", 1, n, 40))
                       + full(b"stsc", _struct.pack(">I", 0))
                       + full(b"stsz", _struct.pack(">II", 0, n)
                              + _struct.pack(">I", 2) * n)
                       + full(b"stco", _struct.pack(">I", 0)))
            trak = box(b"trak", tkhd + box(b"mdia", mdhd + hdlr
                                           + box(b"minf", stbl)))
            return (box(b"ftyp", b"isom" + _struct.pack(">I", 512))
                    + box(b"moov", mvhd + trak)
                    + box(b"mdat", b"\x00" * (2 * n)))

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n, w, h = 5 + d % 20, 16 * (1 + d % 40), 16
                info = probe_mp4(make_mp4(n, w, h))
                (tr,) = info.tracks
                rows.append(
                    {
                        "doc_id": d,
                        "n_frames": len(tr.sample_sizes),
                        "duration_ms": tr.duration_ms,
                        "width": tr.width,
                        "codec": tr.codec,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id bigint, n_frames int, duration_ms bigint, "
               "width int, codec string",
    )


@register(
    "mm7_png16_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(2 + doc_id % 5 AS INT) AS width,
           CAST(2 + doc_id % 4 AS INT) AS height,
           CAST((doc_id * 257) % 65536 AS DOUBLE) AS mean_px
    FROM documents
    """,
)
def mm7_png16_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-BIT PNG decode path oracle-checked (the round-6 decoder
    addition): in-query writer emits Sub-FILTERED 16-bit gray scanlines
    (first pixel literal big-endian, the rest zero deltas — a constant
    image only if the defilter strides bpp=2 bytes and the sample view is
    big-endian; a 1-byte-bpp or little-endian bug shifts every mean) →
    production ``decode_image`` → analytically-predicted dims + mean."""
    import struct as _struct
    import zlib as _zlib
    from collections.abc import Iterator

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tulflow_spark.ext.media_codecs import decode_image

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                _struct.pack(">I", len(body)) + tag + body
                + _struct.pack(">I", _zlib.crc32(tag + body))
            )

        def make_png16(w: int, h: int, v16: int) -> bytes:
            ihdr = _struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
            row = (
                bytes([1])                      # Sub filter
                + _struct.pack(">H", v16)       # first pixel literal
                + b"\x00\x00" * (w - 1)         # zero deltas at bpp=2
            )
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _zlib.compress(row * h))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, v = 2 + d % 5, 2 + d % 4, (d * 257) % 65536
                img = decode_image(make_png16(w, h, v))
                rows.append(
                    {
                        "doc_id": d,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "mean_px": float(np.mean(img)),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen, schema="doc_id bigint, width int, height int, mean_px double"
    )


@register(
    "mm8_vorbis_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST((8 + doc_id % 8) * 128 AS BIGINT) AS n_samples,
           TRUE AS tone_in_band
    FROM documents
    """,
)
def mm8_vorbis_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vorbis decode path oracle-checked (r6 VERDICT #3): per-row minimal
    Ogg/Vorbis streams (ext/vorbis.py::encode_test_tone — codebooks,
    flat floor1, one residue pass placing a single MDCT bin) run through
    the PRODUCTION decode_audio; sample counts are analytic and the
    decoded tone must land within one DFT bin of (bin+0.5)*rate/256 Hz
    (the decoded stream is 128-sample-periodic, so its energy sits on the
    harmonics bracketing the MDCT bin frequency)."""
    from collections.abc import Iterator

    import pandas as pd

    # the per-row decode is the cost (~3 ms/stream, pure Python); the
    # input is a single-file id column, so spread it across executor
    # threads BEFORE the decode stage (shuffles 8-byte ids only)
    docs = (table(spark, sf_dir, "documents")
            .select("doc_id").repartition(32))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tulflow_spark.ext.media_codecs import decode_audio
        from tulflow_spark.ext.vorbis import encode_test_tone

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                bin_k = 32 + d % 32
                n_frames = 9 + d % 8
                pcm, rate = decode_audio(encode_test_tone(bin_k, n_frames))
                mid = pcm[128 : 128 + 768].astype(np.float64)
                peak = int(np.argmax(np.abs(np.fft.rfft(mid))))
                peak_mdct = peak * 256.0 / len(mid)
                rows.append(
                    {
                        "doc_id": d,
                        "sample_rate": rate,
                        "n_samples": len(pcm),
                        "tone_in_band": abs(peak_mdct - (bin_k + 0.5))
                        <= 1.0,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id bigint, sample_rate int, n_samples bigint, "
               "tone_in_band boolean",
    )


@register(
    "mm9_audio_features",
    oracle="""
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST((8 + doc_id % 6) * 128 AS BIGINT) AS n_samples,
           CAST(4 + (doc_id // 6) % 4 AS BIGINT) AS top_band
    FROM documents
    """,
)
def mm9_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio FEATURE stage driver-proven end to end: per-row Vorbis
    streams -> the production ``decode_audio_features`` mapInPandas stage
    (real decode + FFT band energies) -> JVM argmax over the feature
    array.  Tone bins are chosen interior to their band (k%8 in 1..6) so
    the harmonic straddle of the 128-periodic decoded signal never
    crosses a band boundary — top_band is then analytic in doc_id."""
    from collections.abc import Iterator

    import pandas as pd

    from tulflow_spark.ext.multimodal import decode_audio_features

    ids = table(spark, sf_dir, "documents").select("doc_id").repartition(32)

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.ext.vorbis import encode_test_tone

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                bin_k = 33 + (d % 6) + 8 * ((d // 6) % 4)
                rows.append({
                    "media_id": d,
                    "content": encode_test_tone(bin_k, 9 + d % 6),
                })
            yield pd.DataFrame(rows)

    media = ids.mapInPandas(make, schema="media_id bigint, content binary")
    feats = decode_audio_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        (F.array_position(F.col("features"), F.array_max("features")) - 1)
        .cast("long")
        .alias("top_band"),
    )


@register(
    "mm10_mp3_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(48000 AS INT) AS sample_rate,
           CAST((3 + doc_id % 4) * 1152 AS BIGINT) AS n_samples,
           TRUE AS tone_in_band
    FROM documents
    """,
)
def mm10_mp3_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 decode path oracle-checked (r7 VERDICT #2, the Vorbis strategy
    of mm8): per-row minimal MPEG-1 Layer III streams
    (ext/mp3.py::encode_test_tone_mp3 — side info, table-1 Huffman
    big-values, a single spectral line) run through the PRODUCTION
    decode_audio; every fifth stream uses window-switching MIXED blocks,
    and of the rest, those with doc_id % 3 != 0 route their main data
    through the bit reservoir (main_data_begin back-pointers) — both
    paths driver-proven.  Sample counts are analytic and the decoded
    tone must land within 1.5 DFT bins of (line_k + 0.5) * rate / 1152."""
    from collections.abc import Iterator

    import pandas as pd

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id").repartition(32))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tulflow_spark.ext.media_codecs import decode_audio
        from tulflow_spark.ext.mp3 import encode_test_tone_mp3

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                # every fifth stream uses mixed blocks (window switching,
                # tone in the long lower-two-subband region) so that
                # decode path is driver-proven too; the rest: line_k <=
                # 416 keeps worst-case main data (53 B) plus the 20 B
                # reservoir shift inside the 75 B frame payload
                mixed = d % 5 == 0
                line_k = 5 + (d % 30) if mixed else 20 + (d % 100) * 4
                n_frames = 3 + d % 4
                pcm, rate = decode_audio(encode_test_tone_mp3(
                    line_k, n_frames,
                    reservoir_bytes=0 if mixed else (d % 3) * 10,
                    mixed_block=mixed,
                ))
                mid = pcm[1152:1152 + 2304].astype(np.float64)
                peak = int(np.argmax(np.abs(np.fft.rfft(mid))))
                expect = (line_k + 0.5) / 1152 * len(mid)
                rows.append(
                    {
                        "doc_id": d,
                        "sample_rate": rate,
                        "n_samples": len(pcm),
                        "tone_in_band": abs(peak - expect) <= 1.5,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id bigint, sample_rate int, n_samples bigint, "
               "tone_in_band boolean",
    )


@register(
    "mm11_flac_roundtrip",
    oracle="""
    SELECT d.doc_id,
           CAST(16000 AS INT) AS sample_rate,
           CAST(1024 * (2 + d.doc_id % 3) AS BIGINT) AS n_samples,
           CAST(SUM((d.doc_id * 7 + g.i * 13) % 997 - 498) AS BIGINT)
               AS pcm_sum,
           TRUE AS lossless
    FROM documents d
    JOIN generate_series(0, 4095) g(i)
      ON g.i < 1024 * (2 + d.doc_id % 3)
    GROUP BY d.doc_id
    """,
)
def mm11_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC decode path oracle-checked (the mm8/mm10 strategy, but
    LOSSLESS: the oracle recomputes the exact PCM sum in SQL because the
    decoded integers must equal the encoded ones bit-for-bit).  Per-row
    deterministic signals s[i] = (doc_id*7 + i*13) % 997 - 498 are
    encoded with the production ext/flac.py encoder — doc_id % 3 == 0
    streams use VERBATIM subframes, the rest FIXED order 1/2 with Rice
    residuals, so both decode arithmetic paths are driver-proven — and
    decoded through the PRODUCTION decode_audio (CRC-8/CRC-16/MD5 all
    verified in-path).  `lossless` asserts full array equality, not just
    the checksum."""
    from collections.abc import Iterator

    import pandas as pd

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id").repartition(32))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tulflow_spark.ext.flac import encode_flac
        from tulflow_spark.ext.media_codecs import decode_audio

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 1024 * (2 + d % 3)
                i = np.arange(n, dtype=np.int64)
                sig = (d * 7 + i * 13) % 997 - 498
                order = None if d % 3 == 0 else 1 + d % 2
                blob = encode_flac(sig, 16000, block_size=1024,
                                   fixed_order=order)
                pcm, rate = decode_audio(blob)
                rec = np.rint(pcm.astype(np.float64) * 32768).astype(
                    np.int64
                )
                rows.append(
                    {
                        "doc_id": d,
                        "sample_rate": rate,
                        "n_samples": len(rec),
                        "pcm_sum": int(rec.sum()),
                        "lossless": bool(np.array_equal(rec, sig)),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id bigint, sample_rate int, n_samples bigint, "
               "pcm_sum bigint, lossless boolean",
    )
