"""Corpus drift monitoring: Population Stability Index (PSI) between two
corpus slices over a bucketed feature — the standard pipeline-health check
for "did this week's crawl change shape?" (PSI < 0.1 stable, 0.1-0.25
moderate shift, > 0.25 action).  PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with
Laplace smoothing so empty buckets are defined.

Scale shape: two aggregates over (split, bucket) — a shuffle of at most
2 × n_buckets rows after map-side partial aggregation, regardless of
corpus size; the totals are a broadcast one-row frame (same shared-subtree
pattern as q11, so the counts scan runs once).  Everything is engine-exact
except ln(), whose ≤1-ulp libm variance is absorbed by the ROUND(…,9) the
DuckDB oracle mirrors.

No reference analogue; LLM-pipeline extension surface (monitoring tier
beside the profiling operator pr1)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_table(
    df: DataFrame,
    split_col: str | Column,
    bucket_col: str | Column,
    n_buckets: int = 10,
) -> DataFrame:
    """Per-bucket PSI terms between split 0 ("a") and split 1 ("b").

    Returns (bucket, n_a, n_b, term) with a full 0..n_buckets-1 spine
    (missing buckets count 0) and ``term = round((pa−pb)·ln(pa/pb), 9)``
    where ``p = (count+1)/(total+n_buckets)`` (Laplace).  Sum the term
    column (decimal-cast) for the scalar PSI."""
    split = F.col(split_col) if isinstance(split_col, str) else split_col
    bucket = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    counts = (
        df.select(split.cast("int").alias("_split"),
                  bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_split") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("_split") == 1, 1).otherwise(0)).alias("n_b"),
        )
    )
    spine = df.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    full = (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        )
    )
    totals = full.agg(
        F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb")
    )
    k = F.lit(n_buckets).cast("double")
    pa = (F.col("n_a") + 1).cast("double") / (F.col("_ta").cast("double") + k)
    pb = (F.col("n_b") + 1).cast("double") / (F.col("_tb").cast("double") + k)
    return (
        full.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.round((pa - pb) * F.log(pa / pb), 9).alias("term"),
        )
    )


__all__ = ["psi_table"]
