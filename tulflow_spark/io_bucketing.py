"""Bucketed staging: pre-shuffle fact tables ONCE so repeated fact⋈fact
joins and aggregations on the bucket key run with no exchange at all.

At 100 TB the lineitem⋈orders shuffle is the single largest cost in the
star-join family; bucketing both sides by the join key at write time
(`bucketBy(n, key) + sortBy(key)`) turns every subsequent join on that key
into a zip of co-located sorted buckets.  This module wraps the write/read
pair; `tests/test_bucketing.py` asserts the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted table (external when ``path`` given —
    the catalog entry carries the bucket spec either way)."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
