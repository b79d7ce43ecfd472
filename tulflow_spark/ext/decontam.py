"""Benchmark decontamination: flag/drop training documents that share word
n-grams with a held-out evaluation set — the standard pretraining-corpus
hygiene pass (GPT-3 appendix C / PaLM-style 13-gram overlap, exposed with
a configurable n).

Scale shape (the part that must survive 100 TB):

- The BENCHMARK side is control-plane-sized (eval suites are 10^4-10^5
  documents).  Its distinct n-grams are hashed to 16-hex-char md5 prefixes
  (64-bit space: fixed-width keys regardless of gram length, collision
  probability ~m^2/2^65 — negligible at any real benchmark size) and
  collected into ONE array row that broadcasts to every executor.
- The CORPUS side never shuffles and never explodes: each document
  computes its distinct gram-hash array map-side (O(tokens) zip_with
  construction, same as ext.dedup.word_shingles) and probes the broadcast
  set with ``array_intersect`` — a pure-JVM whole-stage-codegen filter.
  Contrast with the naive exploded-grams join, which shuffles
  ~tokens-per-doc rows per document.

No reference-repo analogue (the reference moves records, it doesn't
curate corpora); extends the LLM-pipeline surface beside ext.dedup and
ext.curation.
"""

from __future__ import annotations

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


def benchmark_gram_set(benchmark: DataFrame, text_col: str, n: int = 13) -> DataFrame:
    """ONE-row frame (_bench: array<string>) holding the benchmark's
    distinct gram hashes, sorted for determinism.  The only shuffle in the
    whole operator is the distinct over this (small) side."""
    return (
        benchmark.select(F.explode(_gram_hashes(text_col, n)).alias("_gh"))
        .distinct()
        .agg(F.sort_array(F.collect_set("_gh")).alias("_bench"))
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
    clean by definition.  Corpus side is map-only against the broadcast
    benchmark set."""
    bench = benchmark_gram_set(benchmark, text_col, n)
    dg = _gram_hashes(text_col, n)
    return docs.crossJoin(F.broadcast(bench)).select(
        F.col(id_col),
        F.size(dg).alias("n_grams"),
        F.size(F.array_intersect(dg, F.col("_bench"))).alias("n_hit"),
        (F.size(F.array_intersect(dg, F.col("_bench"))) > 0).alias(
            "contaminated"
        ),
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
    with their original columns; the filter is a map-side predicate over
    the broadcast set, so the corpus is scanned exactly once with no
    shuffle."""
    bench = benchmark_gram_set(benchmark, text_col, n)
    dg = _gram_hashes(text_col, n)
    return (
        docs.crossJoin(F.broadcast(bench))
        .filter(
            F.size(F.array_intersect(dg, F.col("_bench"))) <= int(max_hits)
        )
        .drop("_bench")
    )


__all__ = ["benchmark_gram_set", "contamination", "decontaminate"]
