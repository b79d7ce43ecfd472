"""BM25 lexical search over a persisted inverted index — the classic IR
baseline beside the embedding-based retrievers (ext.similarity /
ext.ivfpq), and the candidate generator ext.rerank's second stage
expects.

Index layout on disk (any pyarrow-reachable filesystem via fsio):

- ``{path}/postings/_pp=XX/*.parquet``  (term, doc id, tf, dl) —
  PARTITIONED BY the term's 2-hex md5 prefix, so a query touching q
  terms reads at most q of 256 directories (directory-pruned scan, the
  on-disk analogue of a term-sharded posting store).  ``dl`` is
  DENORMALIZED into the posting row — the classic search-engine layout
  that saves the per-query join against a corpus-sized doc-length table.
- ``{path}/terms/*.parquet``  (term, df, idf) — vocabulary-sized; a
  query broadcasts only its own terms' rows.
- ``{path}/meta.json``  (n_docs, avgdl, k1, b).

Scoring (Robertson/Sparck-Jones BM25, k1=1.2 b=0.75 defaults), kept
engine-exact the way the LM/PSI operators are: every transcendental is
rounded to 9 decimals the moment it is produced —
``idf = round(ln((N - df + 0.5)/(df + 0.5) + 1), 9)`` at build time,
``contrib = round(idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)), 9)``
at query time — and per-document scores are DECIMAL(30,9) sums of those
rounded contributions, so any SQL engine reproduces scores and ranks
bit for bit.

Tokenization is lowercased whitespace tokens (ext.text.tokens), the same
contract as the dedup shingles and the oracle's string_split_regex.

No reference-repo analogue; LLM-pipeline extension surface.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window

from tulflow_spark.io import read_parquet as _read_parquet
from pyspark.sql import functions as F

from tulflow_spark import fsio
from tulflow_spark.ext.text import tokens

K1 = 1.2
B = 0.75


def _lower_tokens(text_col: str):
    return F.transform(tokens(text_col), lambda t: F.lower(t))


def build_bm25_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    positions: bool = False,
) -> dict:
    """Index a corpus for BM25 search.  One explode + two aggregates;
    postings land partitioned by term-hash prefix.  ``positions=True``
    additionally stores each term's sorted 0-based token positions in
    the posting row (the positional index :func:`phrase_search` needs —
    costs one int per token, the standard positional-postings overhead).
    Returns the meta dict."""
    from tulflow_spark.io import widen

    # tokenization is the expensive map stage and feeds BOTH the corpus
    # stats pass and the explode below: run it at cluster width even off
    # a single-split scan (widen is a no-op when the scan already splits)
    toked = widen(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc"), _lower_tokens(text_col).alias("_t")
    )
    stats = toked.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.size("_t").cast("long")), F.lit(0)).alias("tot"),
    ).head()
    n_docs, total = int(stats["n"]), int(stats["tot"])
    avgdl = total / n_docs if n_docs else 0.0
    exploded = toked.select(
        "doc",
        F.size("_t").cast("long").alias("dl"),
        F.posexplode("_t").alias("_pos", "term"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("tf")]
    if positions:
        aggs.append(F.sort_array(F.collect_list("_pos")).alias("pos"))
    postings = exploded.groupBy("term", "doc", "dl").agg(*aggs)
    # cluster by the partition column before the partitioned write: an
    # unclustered write makes EVERY task open a file per term-hash prefix
    # it holds (up to 256 × tasks tiny files); hash-distributing first is
    # the write.distribution-mode=hash recipe (guide §6) — one exchange
    # of posting rows, each output dir written by one task
    n_write = df.sparkSession.sparkContext.defaultParallelism
    postings.withColumn(
        "_pp", F.substring(F.md5(F.col("term")), 1, 2)
    ).repartition(n_write, F.col("_pp")).write.mode(
        "overwrite"
    ).partitionBy("_pp").parquet(f"{path}/postings")
    spark = df.sparkSession
    stored = _read_parquet(spark, f"{path}/postings")
    idf = F.round(
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
            + 1.0
        ),
        9,
    )
    stored.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    ).withColumn("idf", idf).write.mode("overwrite").parquet(
        f"{path}/terms"
    )
    meta = {
        "n_docs": n_docs,
        "total_tokens": total,
        "avgdl": avgdl,
        "k1": K1,
        "b": B,
        "terms_dir": "terms",
        "positions": bool(positions),
    }
    fsio.write_text(f"{path}/meta.json", json.dumps(meta))
    return meta


def bm25_search(
    spark: SparkSession, path: str, query_terms: list[str], k: int = 10
) -> DataFrame:
    """Top-k documents for a bag of query terms: read ONLY the query
    terms' posting partitions (directory-pruned via the _pp filter),
    broadcast their idf rows, score with the rounded-contribution form,
    rank by (score desc, doc).  Returns (doc, score, rank)."""
    fs, p = fsio.resolve(f"{path}/meta.json")
    with fs.open_input_stream(p) as stream:
        meta = json.loads(stream.read().decode("utf-8"))
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    import hashlib

    pps = sorted({hashlib.md5(t.encode()).hexdigest()[:2] for t in terms})
    post = (
        _read_parquet(spark, f"{path}/postings")
        .filter(F.col("_pp").isin(pps))
        .filter(F.col("term").isin(terms))
    )
    idf = (
        _read_parquet(spark, f"{path}/{meta.get('terms_dir', 'terms')}")
        .filter(F.col("term").isin(terms))
        .select("term", "idf")
    )
    k1, b, avgdl = meta["k1"], meta["b"], meta["avgdl"]
    sat = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.lit(avgdl))
    )
    contrib = F.round(F.col("idf") * sat, 9)
    scored = (
        post.join(F.broadcast(idf), "term")
        .withColumn("_c", contrib)
        .groupBy("doc")
        .agg(
            F.sum(F.col("_c").cast("decimal(30,9)"))
            .cast("double")
            .alias("score")
        )
    )
    # global top-k via sort+limit (TakeOrderedAndProject — no full-sort
    # shuffle); the rank window then runs over k rows only
    topk = scored.orderBy(F.desc("score"), F.col("doc")).limit(int(k))
    w = Window.orderBy(F.desc("score"), F.col("doc"))
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("doc", "score", "rank")


def append_to_bm25_index(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
) -> dict:
    """Incremental index maintenance: add a batch of NEW documents (ids
    must be disjoint from the indexed corpus).  Postings append into the
    partitioned layout; the vocabulary sidecar re-derives df by ADDING
    the batch's per-term document counts (a vocab-sized rewrite, never a
    postings rescan) and recomputes idf from the exact new (N, df);
    n_docs/total_tokens update from exact integer counters in meta.

    Invariant (pinned by test): a SUCCESSFUL append(half B) onto
    index(half A) yields an index byte-equivalent in search results to
    build(A ∪ B) — postings rows, df counts, and avgdl all add exactly.

    Crash contract (single-writer): the postings append lands BEFORE the
    sidecar/meta swing, so a crash in between leaves appended postings
    scored with the old N/df/avgdl, and blindly re-running the append
    would double-count the batch's postings.  After a failed append,
    either rebuild the index or vacuum the partial commit's files before
    retrying — the meta pointer only makes the SIDECAR swap atomic, not
    the postings append.  Returns the new meta."""
    fs, p = fsio.resolve(f"{path}/meta.json")
    with fs.open_input_stream(p) as stream:
        meta = json.loads(stream.read().decode("utf-8"))
    toked = new_df.select(
        F.col(id_col).alias("doc"), _lower_tokens(text_col).alias("_t")
    )
    stats = toked.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.size("_t").cast("long")), F.lit(0)).alias("tot"),
    ).head()
    batch_n, batch_tot = int(stats["n"]), int(stats["tot"])
    exploded = toked.select(
        "doc",
        F.size("_t").cast("long").alias("dl"),
        F.posexplode("_t").alias("_pos", "term"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("tf")]
    if meta.get("positions"):  # keep the positional layout uniform
        aggs.append(F.sort_array(F.collect_list("_pos")).alias("pos"))
    postings = exploded.groupBy("term", "doc", "dl").agg(*aggs)
    postings.withColumn(
        "_pp", F.substring(F.md5(F.col("term")), 1, 2)
    ).write.mode("append").partitionBy("_pp").parquet(f"{path}/postings")

    batch_df = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("_bdf")
    )
    old_dir = meta.get("terms_dir", "terms")
    old_terms = _read_parquet(spark, f"{path}/{old_dir}").select("term", "df")
    n_docs = int(meta["n_docs"]) + batch_n
    total = int(meta["total_tokens"]) + batch_tot
    merged = (
        old_terms.join(batch_df, "term", "full_outer")
        .select(
            "term",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("_bdf"), F.lit(0))
            ).cast("long").alias("df"),
        )
        .withColumn(
            "idf",
            F.round(
                F.log(
                    (F.lit(float(n_docs)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                ),
                9,
            ),
        )
    )
    # the old sidecar is an INPUT of this job, so never overwrite it in
    # place: write a fresh versioned dir and swing the meta pointer (the
    # meta write is the commit point, same discipline as the manifest
    # snapshot store); the superseded dir is garbage a later append may
    # remove
    new_dir = (
        f"terms-v2" if old_dir == "terms"
        else f"terms-v{int(old_dir.rsplit('-v', 1)[1]) + 1}"
    )
    merged.write.parquet(f"{path}/{new_dir}")
    new_meta = {
        "n_docs": n_docs,
        "total_tokens": total,
        "avgdl": total / n_docs if n_docs else 0.0,
        "k1": meta["k1"],
        "b": meta["b"],
        "terms_dir": new_dir,
        "positions": bool(meta.get("positions")),
    }
    fsio.write_text(f"{path}/meta.json", json.dumps(new_meta))
    return new_meta


def phrase_search(
    spark: SparkSession, path: str, phrase: list[str] | str
) -> DataFrame:
    """Exact phrase matching over a POSITIONAL index (built with
    ``positions=True``): documents where the phrase's tokens appear
    consecutively, with the number of (possibly overlapping) occurrences.

    Mechanism: read only the phrase terms' posting partitions, join them
    by doc (an n-way join for an n-word phrase — n is query-sized), and
    intersect position arrays SHIFTED by each term's offset in the
    phrase: ``matches = pos_0 ∩ (pos_1 − 1) ∩ … ∩ (pos_{n-1} − (n−1))``
    — pure JVM array algebra, no Python, no text rescan.  Returns
    (doc, n_occurrences) with n_occurrences >= 1."""
    fs, p = fsio.resolve(f"{path}/meta.json")
    with fs.open_input_stream(p) as stream:
        meta = json.loads(stream.read().decode("utf-8"))
    if not meta.get("positions"):
        raise ValueError(
            "index was built without positions=True; rebuild with a "
            "positional layout to run phrase queries"
        )
    terms = (
        [t.lower() for t in phrase.split()]
        if isinstance(phrase, str)
        else [t.lower() for t in phrase]
    )
    if not terms:
        raise ValueError("phrase must be non-empty")
    import hashlib

    pps = sorted({hashlib.md5(t.encode()).hexdigest()[:2] for t in terms})
    post = (
        _read_parquet(spark, f"{path}/postings")
        .filter(F.col("_pp").isin(pps))
        .filter(F.col("term").isin(sorted(set(terms))))
        .select("term", "doc", "pos")
    )
    acc = None
    for i, t in enumerate(terms):
        side = post.filter(F.col("term") == t).select(
            "doc",
            F.transform(F.col("pos"), lambda x: x - i).alias(f"_p{i}"),
        )
        acc = side if acc is None else acc.join(side, "doc")
    match_expr = F.col("_p0")
    for i in range(1, len(terms)):
        match_expr = F.array_intersect(match_expr, F.col(f"_p{i}"))
    return (
        acc.select(
            "doc",
            F.size(match_expr).cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") > 0)
    )


__all__ = [
    "append_to_bm25_index",
    "phrase_search",
    "build_bm25_index",
    "bm25_search",
    "K1",
    "B",
]
