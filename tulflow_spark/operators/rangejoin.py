"""Interval (range) join: each point row matched to every interval that
contains it — events→promo-windows, readings→maintenance-windows, the
join shape behind windowed attribution.

Spark has no native range join; the naive ``ON p BETWEEN s AND e``
compiles to BroadcastNestedLoopJoin (or a cartesian per key) — O(|P|·|I|)
comparisons, the classic 100 TB scale-killer.  This operator uses the
standard bucketization rewrite (the same trick Databricks' range-join
hints apply): pick a bucket width W, give every point its bucket
``floor(p/W)``, explode every interval to the buckets it covers, and
equi-join on bucket before the residual containment filter.

- Each (point, interval) pair can only meet in the point's single bucket,
  so no post-join dedup is needed.
- Shuffle volume: |P| + Σ ceil(len_i/W) interval replicas — W trades
  replication against residual-filter selectivity; a W near the median
  interval length keeps both ~O(1).
- The equi-join is a plain hash/sort-merge join: broadcastable when the
  exploded interval side is small, AQE-skew-splittable otherwise, and the
  physical plan contains NO nested-loop/cartesian operator (pinned in
  tests/test_rangejoin.py).

Works on any numeric point/boundary columns (cast dates to epoch days
with ``datediff`` first — engine-portable, timestamp-type-agnostic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int | float,
    on: list[str] | None = None,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner join: point rows × the intervals containing them.

    Containment is ``start <= point < end`` (``<= end`` with
    ``end_inclusive``).  ``on`` adds equi-key columns (both sides) to the
    bucket join.  Intervals with ``end < start`` are dropped (they can
    contain nothing and would break the bucket expansion).  Column name
    collisions between the two frames (other than ``on``) must be
    resolved by the caller.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    on = on or []
    w = F.lit(bucket_width)
    integral = {"tinyint", "smallint", "int", "bigint"}
    exact_width = isinstance(bucket_width, int)

    def bucket(df: DataFrame, name: str) -> Column:
        # Integral keys (and an integral width): exact floor-division in
        # long arithmetic.  A double round-trip loses integer precision
        # past 2^53 (epoch nanos, snowflake ids), which could silently
        # skip a bucket.  pmod is non-negative, so (c - pmod) is the
        # floored multiple of w and the integral `div` is exact for
        # negatives too.  Column lookup mirrors Spark's case-insensitive
        # resolution (F.col("T") finds column "t").
        c = F.col(name)
        types = {k.lower(): v for k, v in df.dtypes}
        if exact_width and types.get(name.lower()) in integral:
            cl = c.cast("long")
            return F.call_function("div", cl - F.pmod(cl, w), w)
        return F.floor(c.cast("double") / w).cast("long")

    pb = points.withColumn("_bucket", bucket(points, point_col))
    ib = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    bucket(intervals, start_col), bucket(intervals, end_col)
                )
            ),
        )
    )
    contained = F.col(point_col) >= F.col(start_col)
    upper = (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    return (
        pb.join(ib, on + ["_bucket"])
        .filter(contained & upper)
        .drop("_bucket")
    )


__all__ = ["interval_join"]
