"""Mergeable HLL sketches: merge-of-partials must estimate the TRUE global
distinct count (not the sum of per-slice counts), within HLL error bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

from tulflow_spark.ext.sketches import distinct_sketch, merge_sketches
from tulflow_spark.io import table

SF = "/root/testdata/sf0.01"


def test_sketch_merge_estimates_global_distinct(spark):
    ev = table(spark, SF, "events")
    # per-day partials (the storable form)
    daily = distinct_sketch(
        ev.withColumn("day", F.to_date("ts")), ["day"], "user_id"
    )
    assert daily.count() > 1
    # merged estimate over all days vs exact global distinct
    est = merge_sketches(
        daily.withColumn("_all", F.lit(1)), ["_all"]
    ).head().distinct_estimate
    exact = ev.select("user_id").distinct().count()
    # users repeat across days: naive sum of dailies would be ~30x too big;
    # the merge must deduplicate across slices
    naive_sum = merge_sketches(daily, ["day"]).agg(
        F.sum("distinct_estimate")
    ).head()[0]
    assert naive_sum > exact * 2
    assert abs(est - exact) / exact < 0.05


def test_sketch_column_is_storable(spark, tmp_path):
    """Sketches survive a parquet round-trip (binary column) and still merge."""
    ev = table(spark, SF, "events")
    daily = distinct_sketch(
        ev.withColumn("day", F.to_date("ts")), ["day"], "user_id"
    )
    p = str(tmp_path / "sketches")
    daily.write.parquet(p)
    back = spark.read.parquet(p).withColumn("_all", F.lit(1))
    est = merge_sketches(back, ["_all"]).head().distinct_estimate
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05
