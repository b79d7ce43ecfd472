"""Corpus curation: the composed clean→dedup pipeline a training-data run
applies to raw documents, built from the primitive operators.

- :func:`boilerplate_ngrams`: shingles appearing across many documents
  (header/footer/license boilerplate detection — the document-frequency
  inverse of near-dup detection).
- :func:`curate_exact`: quality-gate + exact dedup, fully deterministic and
  oracle-checkable.
- :func:`curate_near_dup`: the production composition — quality gate, exact
  dedup, then MinHash-LSH near-dup removal keeping the lowest id per
  near-dup cluster (greedy by id: deterministic, one pass over pairs).

Scale: each step is a bounded-shuffle primitive documented in DESIGN.md §4;
the composition adds no new shuffles beyond its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tulflow_spark.ext.dedup import exact_dedup, minhash_lsh_pairs, word_shingles
from tulflow_spark.ext.text import quality_score


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_doc_frequency: int = 3,
) -> DataFrame:
    """Shingles occurring in >= min_doc_frequency distinct documents:
    (gram, doc_frequency).  At scale this list feeds a broadcast filter that
    strips boilerplate before modeling."""
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, n).alias("_sh")
    )
    return (
        sh.select(F.explode("_sh").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_frequency"))
        .filter(F.col("doc_frequency") >= min_doc_frequency)
    )


def curate_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.5,
) -> DataFrame:
    """Quality gate + exact dedup; returns surviving (id, quality)."""
    scored = df.select(
        F.col(id_col), F.col(text_col), quality_score(text_col).alias("quality")
    ).filter(F.col("quality") >= min_quality)
    keepers = exact_dedup(scored, id_col, text_col).select(
        F.col("keeper").alias(id_col)
    )
    return keepers.join(scored, id_col).select(id_col, "quality")


def curate_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.4,
    near_dup_threshold: float = 0.8,
    **minhash_kwargs,
) -> DataFrame:
    """Full curation: quality gate → exact dedup → near-dup removal.

    Near-dup policy: from every pair with jaccard >= threshold, drop the
    higher id — the transitive result keeps exactly the minimum id of each
    connected near-dup component reachable by the candidate pairs.
    """
    base = curate_exact(df, id_col, text_col, min_quality)
    survivors = df.join(base.select(id_col), id_col)
    pairs = minhash_lsh_pairs(
        survivors, id_col, text_col,
        threshold=near_dup_threshold, **minhash_kwargs,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return base.join(losers, id_col, "left_anti")
