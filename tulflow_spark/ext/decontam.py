"""Benchmark decontamination: flag/drop training documents that share word
n-grams with a held-out evaluation set — the standard pretraining-corpus
hygiene pass (GPT-3 appendix C / PaLM-style 13-gram overlap, exposed with
a configurable n).

Scale shape (the part that must survive 100 TB):

- The BENCHMARK side is control-plane-sized (eval suites are 10^4-10^5
  documents).  Its distinct n-grams are hashed to 16-hex-char md5 prefixes
  (64-bit space: fixed-width keys regardless of gram length, collision
  probability ~m^2/2^65 — negligible at any real benchmark size).
- BATCH corpus side: each document's distinct gram hashes (O(tokens)
  zip_with construction, same as ext.dedup.word_shingles) EXPLODE into a
  BroadcastHashJoin probe against the benchmark gram frame — the
  benchmark hash table is built ONCE per executor and probed per gram,
  so total work is O(corpus grams), and the only shuffles move (id,
  count) pairs: the hit counts (semi-join survivors only) and the id
  join back.  Document text never shuffles.

  NOT ``array_intersect`` against a broadcast array: that hashes the
  whole benchmark set PER ROW — O(corpus_rows × bench_grams), measured
  ~6 s for 5k docs × 54k grams and quadratic-ish at scale.
- STREAMING corpus side is a stateless Arrow-batched membership probe
  (r6 VERDICT #5): the benchmark's sorted gram hashes ship once per
  executor as a SparkContext broadcast (16 bytes/gram), and an iterator
  ``pandas_udf`` counts each document's hits by vectorized binary search
  — O(doc_grams × log bench_grams) per micro-batch, no per-row hash
  builds, no stateful aggregation, so append-mode semantics are
  preserved.  (The previous ``array_intersect`` array-probe re-hashed
  the whole benchmark set per row: O(rows × bench) per batch — measured
  growing per-batch walls at real benchmark sizes, SCALE.md §5.)

No reference-repo analogue (the reference moves records, it doesn't
curate corpora); extends the LLM-pipeline surface beside ext.dedup and
ext.curation.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tulflow_spark.ext.text import ngrams


def _gram_hashes(text_col: str, n: int):
    """Distinct word n-grams of ``text_col`` as 16-hex-char md5 prefixes —
    computed map-side, engine-portable (any SQL engine re-derives the same
    hashes, so a decontamination verdict can be audited elsewhere)."""
    return F.transform(
        F.array_distinct(ngrams(text_col, n)),
        lambda g: F.substring(F.md5(g), 1, 16),
    )


def benchmark_gram_frame(
    benchmark: DataFrame, text_col: str, n: int = 13
) -> DataFrame:
    """(_gh) — the benchmark's distinct gram hashes, one per row: the
    BUILD side of the batch probe join."""
    return benchmark.select(
        F.explode(_gram_hashes(text_col, n)).alias("_gh")
    ).distinct()


def benchmark_gram_set(benchmark: DataFrame, text_col: str, n: int = 13) -> DataFrame:
    """ONE-row frame (_bench: array<string>) holding the benchmark's
    distinct gram hashes, sorted for determinism — the broadcast form the
    STREAMING path probes with array_intersect."""
    return benchmark_gram_frame(benchmark, text_col, n).agg(
        F.sort_array(F.collect_set("_gh")).alias("_bench")
    )


def _streaming_hit_udf(docs: DataFrame, benchmark: DataFrame,
                       text_col: str, n: int):
    """Arrow-batched hit counter for the streaming path: the benchmark's
    distinct gram hashes (control-plane-sized by construction) are
    collected once, sorted as fixed-width S16 bytes, and broadcast via
    the SparkContext so every executor deserializes them ONCE; the
    returned pandas_udf counts per-document benchmark-gram hits by
    vectorized ``searchsorted`` over each micro-batch's gram arrays."""
    bench_sorted = np.sort(
        np.asarray(
            [
                r["_gh"]
                for r in benchmark_gram_frame(
                    benchmark, text_col, n
                ).collect()
            ],
            dtype="S16",
        )
    )
    bc = docs.sparkSession.sparkContext.broadcast(bench_sorted)

    @F.pandas_udf("int")
    def _nhit(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        arr = bc.value
        m = len(arr)
        for grams in it:
            out = np.zeros(len(grams), dtype="int32")
            if m:
                for i, g in enumerate(grams):
                    if g is None or len(g) == 0:
                        continue
                    gv = np.asarray(g, dtype="S16")
                    idx = np.searchsorted(arr, gv)
                    np.minimum(idx, m - 1, out=idx)
                    out[i] = int(np.count_nonzero(arr[idx] == gv))
            yield pd.Series(out)

    return _nhit


def _hit_counts(
    docs: DataFrame, bench: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, n_hit) for documents with AT LEAST one benchmark gram: the
    exploded BroadcastHashJoin probe (build the benchmark table once,
    probe per corpus gram).  countDistinct keeps the documented
    distinct-gram semantics even if an id (incorrectly) spans rows."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(_gram_hashes(text_col, n)).alias("_gh"),
        )
        .join(F.broadcast(bench), "_gh", "leftsemi")
        .groupBy(id_col)
        .agg(F.countDistinct("_gh").cast("int").alias("n_hit"))
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
) -> DataFrame:
    """Per-document contamination report: (id, n_grams, n_hit,
    contaminated).  ``n_hit`` counts DISTINCT benchmark grams present in
    the document; a document shorter than ``n`` tokens has no grams and is
    clean by definition."""
    dg = _gram_hashes(text_col, n)
    if docs.isStreaming:
        nhit = _streaming_hit_udf(docs, benchmark, text_col, n)
        return docs.select(
            F.col(id_col),
            F.size(dg).alias("n_grams"),
            nhit(dg).alias("n_hit"),
        ).withColumn("contaminated", F.col("n_hit") > 0)
    bench = benchmark_gram_frame(benchmark, text_col, n)
    # n_grams needs no md5 (hashing can't change the array size)
    per_doc = docs.select(
        F.col(id_col),
        F.size(F.array_distinct(ngrams(text_col, n))).alias("n_grams"),
    )
    hits = _hit_counts(docs, bench, id_col, text_col, n).withColumnRenamed(
        id_col, "_hid"
    )
    # null-safe join: a NULL-id document must still get its report row
    joined = per_doc.join(
        hits, per_doc[id_col].eqNullSafe(hits["_hid"]), "left"
    )
    return joined.select(
        per_doc[id_col],
        "n_grams",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    max_hits: int = 0,
) -> DataFrame:
    """Drop contaminated documents (keep those with at most ``max_hits``
    shared benchmark grams — 0 is the strict default; a small positive
    value tolerates boilerplate collisions).  Returns surviving documents
    with their original columns.

    Batch: an anti-join of the corpus against the (small — contamination
    is rare by construction) flagged-id frame; AQE broadcasts it when it
    fits, so the corpus typically never shuffles.  Streaming: the
    stateless Arrow-batched binary-search probe (broadcast sorted gram
    hashes, append-safe, O(doc_grams log bench) per batch)."""
    if docs.isStreaming:
        nhit = _streaming_hit_udf(docs, benchmark, text_col, n)
        dg = _gram_hashes(text_col, n)
        return docs.filter(nhit(dg) <= int(max_hits))
    bench = benchmark_gram_frame(benchmark, text_col, n)
    bad = _hit_counts(docs, bench, id_col, text_col, n).filter(
        F.col("n_hit") > int(max_hits)
    ).withColumnRenamed(id_col, "_bad_id")
    # null-safe anti-join: a NULL-id contaminated doc must still drop
    return docs.join(
        bad.select("_bad_id"),
        F.col(id_col).eqNullSafe(F.col("_bad_id")),
        "left_anti",
    )


__all__ = [
    "benchmark_gram_frame",
    "benchmark_gram_set",
    "contamination",
    "decontaminate",
]
