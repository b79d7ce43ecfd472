"""Training-data-pipeline query inventory (north star): dedup, similarity
search, text analysis — each over the driver's documents/embeddings tables,
with DuckDB oracles wherever SQL-expressible.

Float-parity rules used throughout (see tulflow_spark.functions and
ext.similarity docstrings): decimal-exact SUM/AVG; scaled-integer dot
products; per-row double arithmetic kept in identical evaluation order on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tulflow_spark.ext import dedup, similarity
from tulflow_spark.ext import text as T
from tulflow_spark.functions import dsum_sql
from tulflow_spark.io import table
from tulflow_spark.plans import register

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dd1_exact_dedup",
    oracle="""
    SELECT md5(text) AS ck, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(table(spark, sf_dir, "documents"), "doc_id", "text")


_GRAMS_CTE = """
    toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), flat AS (
      SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS i FROM toks
    ), grams AS (
      SELECT doc_id,
             tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS g
      FROM flat WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ), dg AS (
      SELECT DISTINCT doc_id, g FROM grams WHERE g IS NOT NULL
    )
"""


@register(
    "dd3_ngram_jaccard",
    oracle=f"""
    WITH {_GRAMS_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM dg GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM dg a JOIN dg b USING (g)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, i / (sa.n + sb.n - i) AS jaccard_sim
    FROM inter
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
    WHERE i / (sa.n + sb.n - i) >= 0.1
    """,
)
def dd3_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.1
    )


@register("dd2_minhash_lsh")  # LSH banding is hash-function-specific → rows-only check
def dd2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        k=32,
        bands=8,
        threshold=0.8,
    )


@register("dd4_simhash")  # xxhash64-specific signature → rows-only check
def dd4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_DOT = (
    "SUM(CAST(FLOOR(CAST({a}[g.i] AS DOUBLE) * CAST({b}[g.i] AS DOUBLE) * 1e12)"
    " AS BIGINT))"
)


@register(
    "ss1_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    scores AS (
      SELECT e.vec_id,
             {_DOT.format(a='e.embedding', b='q.qe')} AS dot_s,
             {_DOT.format(a='e.embedding', b='e.embedding')} AS na_s,
             {_DOT.format(a='q.qe', b='q.qe')} AS nq_s
      FROM embeddings e CROSS JOIN q CROSS JOIN generate_series(1, 64) g(i)
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    )
    SELECT vec_id,
           CAST(dot_s AS DOUBLE) /
             (sqrt(CAST(na_s AS DOUBLE)) * sqrt(CAST(nq_s AS DOUBLE))) AS cosine_sim
    FROM scores
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
)
def ss1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    vec = similarity.query_vector(emb, "vec_id", "embedding", 0)
    return similarity.brute_force_topk(
        emb.filter(F.col("vec_id") != 0), vec, k=10, exact_parity=True
    )


@register(
    "ss2_embedding_neardup",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             a.embedding AS va, b.embedding AS vb
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    scores AS (
      SELECT id_a, id_b,
             {_DOT.format(a='va', b='vb')} AS dot_s,
             {_DOT.format(a='va', b='va')} AS na_s,
             {_DOT.format(a='vb', b='vb')} AS nb_s
      FROM pairs CROSS JOIN generate_series(1, 64) g(i)
      GROUP BY id_a, id_b
    )
    SELECT id_a, id_b,
           CAST(dot_s AS DOUBLE) /
             (sqrt(CAST(na_s AS DOUBLE)) * sqrt(CAST(nb_s AS DOUBLE))) AS cosine_sim
    FROM scores
    WHERE CAST(dot_s AS DOUBLE) /
            (sqrt(CAST(na_s AS DOUBLE)) * sqrt(CAST(nb_s AS DOUBLE))) >= 0.4
    """,
)
def ss2_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.blocked_near_dup_pairs(
        table(spark, sf_dir, "embeddings"),
        threshold=0.4,
        exact_parity=True,
    )


@register("ss3_lsh_topk")  # plane signs are seed/numpy-specific → rows-only check
def ss3_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    vec = similarity.query_vector(emb, "vec_id", "embedding", 0)
    return similarity.lsh_topk(emb.filter(F.col("vec_id") != 0), vec, k=10)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_TOKS = "string_split_regex(trim(text), '\\s+')"
_STOPS = "('the','a','of','and','to','in','is','that')"


@register(
    "tx1_token_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_TOKS})) AS DOUBLE) / COUNT(*) AS avg_tokens,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def tx1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(T.token_count("text")).cast("double") / F.count(F.lit(1))).alias(
            "avg_tokens"
        ),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


@register(
    "tx2_quality_scores",
    oracle=f"""
    WITH scored AS (
      SELECT source,
             (least(length(text) / 500.0, 1.0)
              + least((len(list_filter({_TOKS}, x -> lower(x) IN {_STOPS}))
                       / len({_TOKS})) * 4, 1.0)
              + (1.0 - least(((length(text)
                   - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                   / length(text)) * 5, 1.0))) / 3 AS quality
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           {dsum_sql('quality')} AS total_quality
    FROM scored GROUP BY source
    """,
)
def tx2_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    from tulflow_spark.functions import dsum

    return d.select("source", T.quality_score("text").alias("quality")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        dsum("quality", "total_quality"),
    )


@register(
    "tx3_langid_confusion",
    oracle=f"""
    WITH hits AS (
      SELECT lang,
             len(list_filter({_TOKS}, x -> lower(x) IN ('the','and','of'))) AS h_en,
             len(list_filter({_TOKS}, x -> lower(x) IN ('le','la','et'))) AS h_fr,
             len(list_filter({_TOKS}, x -> lower(x) IN ('der','und','das'))) AS h_de,
             len(list_filter({_TOKS}, x -> lower(x) IN ('el','los','que'))) AS h_es
      FROM documents
    ), pred AS (
      SELECT lang,
             CASE WHEN greatest(h_en, h_fr, h_de, h_es) = 0 THEN 'und'
                  WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
                  WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
                  WHEN h_en >= h_de THEN 'en'
                  ELSE 'de' END AS pred_lang
      FROM hits
    )
    SELECT lang, pred_lang, COUNT(*) AS n
    FROM pred GROUP BY lang, pred_lang
    """,
)
def tx3_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select("lang", T.predict_lang("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "tx4_fingerprints",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
      FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(substr(t, 1, 64) || '|' || substr(reverse(t), 1, 64)))
             AS n_unique_fp
    FROM norm
    """,
)
def tx4_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(T.doc_fingerprint("text")).alias("n_unique_fp"),
    )


@register("dd5_lsh_blocked_neardup")  # plane signs are seed-specific → rows-only
def dd5_lsh_blocked_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-path embedding near-dup: sign-LSH bucket as the blocking
    key (quadratic work bounded per bucket) instead of a label column."""
    emb = table(spark, sf_dir, "embeddings")
    bucketed = similarity.signature_buckets(emb, n_planes=8)
    return similarity.blocked_near_dup_pairs(
        bucketed, block_col="lsh_bucket", threshold=0.3
    )


@register("ss4_ivf_topk")  # centroid assignment is model-specific → rows-only
def ss4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate top-k (KMeans coarse quantizer, 4-of-16 probes)
    — the data-adaptive scale path alongside sign-LSH (ss3)."""
    from tulflow_spark.ext.ivf import build_ivf_index

    emb = table(spark, sf_dir, "embeddings")
    vec = similarity.query_vector(emb, "vec_id", "embedding", 0)
    index = build_ivf_index(emb, n_clusters=16)
    return index.search(vec, k=10, n_probes=4)


@register(
    "dd6_boilerplate_ngrams",
    oracle=f"""
    WITH {_GRAMS_CTE}
    SELECT g AS gram, COUNT(*) AS doc_frequency
    FROM dg GROUP BY g HAVING COUNT(*) >= 3
    """,
)
def dd6_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated shingles (boilerplate detection) — the
    document-frequency rollup that feeds a broadcast strip-filter."""
    from tulflow_spark.ext.curation import boilerplate_ngrams

    return boilerplate_ngrams(
        table(spark, sf_dir, "documents"), "doc_id", "text", min_doc_frequency=3
    )


@register(
    "cur1_curate_exact",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text,
             (least(length(text) / 500.0, 1.0)
              + least((len(list_filter({_TOKS}, x -> lower(x) IN {_STOPS}))
                       / len({_TOKS})) * 4, 1.0)
              + (1.0 - least(((length(text)
                   - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                   / length(text)) * 5, 1.0))) / 3 AS quality
      FROM documents
    ), gated AS (
      SELECT * FROM scored WHERE quality >= 0.5
    ), keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)
    )
    SELECT g.doc_id, g.quality
    FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
    """,
)
def cur1_curate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation (quality gate + exact dedup) under oracle check."""
    from tulflow_spark.ext.curation import curate_exact

    return curate_exact(
        table(spark, sf_dir, "documents"), "doc_id", "text", min_quality=0.5
    )


@register("cur2_curate_near_dup")  # minhash stage → rows-only check
def cur2_curate_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation incl. near-dup removal (the production composition)."""
    from tulflow_spark.ext.curation import curate_near_dup

    return curate_near_dup(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        min_quality=0.4, near_dup_threshold=0.8,
    )


@register("a7_hll_sketch_rollup")  # HLL estimates are impl-specific → rows-only
def a7_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-day HLL partials merged to a
    per-event-type estimate — the no-rescan incremental-rollup pattern
    (store partials, answer unions by merging)."""
    from tulflow_spark.ext.sketches import distinct_sketch, merge_sketches

    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = distinct_sketch(ev, ["event_type", "day"], "user_id")
    return merge_sketches(daily, ["event_type"])
