"""operators/rangejoin.py: bucketized interval join — exactness vs the
naive BETWEEN join, boundary semantics, and the no-nested-loop plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tulflow_spark.operators.rangejoin import interval_join


def _frames(spark):
    pts = spark.createDataFrame(
        [(i, i % 40) for i in range(200)], "pid long, t int"
    )
    # intervals of wildly different lengths, incl. multi-bucket spans,
    # zero-length, and degenerate (end < start, must be dropped)
    iv = spark.createDataFrame(
        [
            (0, 5, 12),
            (1, 0, 40),   # covers everything
            (2, 10, 10),  # empty under exclusive end
            (3, 39, 45),  # partially out of range
            (4, 20, 15),  # degenerate
            (5, 7, 8),
        ],
        "iid long, s int, e int",
    )
    return pts, iv


def _naive(pts, iv, inclusive):
    upper = F.col("t") <= F.col("e") if inclusive else F.col("t") < F.col("e")
    return pts.join(
        iv.filter(F.col("e") >= F.col("s")),
        (F.col("t") >= F.col("s")) & upper,
    )


@pytest.mark.parametrize("inclusive", [False, True])
@pytest.mark.parametrize("width", [1, 4, 7, 100])
def test_matches_naive_between_join(spark, inclusive, width):
    pts, iv = _frames(spark)
    got = interval_join(
        pts, iv, "t", "s", "e", bucket_width=width, end_inclusive=inclusive
    )
    exp = _naive(pts, iv, inclusive)
    key = lambda r: (r["pid"], r["iid"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))


def test_equi_keys_restrict_matches(spark):
    pts = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5)], "pid long, k string, t int"
    )
    iv = spark.createDataFrame([("a", 0, 10)], "k string, s int, e int")
    got = interval_join(pts, iv, "t", "s", "e", 4, on=["k"]).collect()
    assert [r["pid"] for r in got] == [1]


def test_no_nested_loop_in_plan(spark):
    """The whole point: the bucketized join must be a hash/sort-merge
    equi-join — the naive BETWEEN join plans a BroadcastNestedLoopJoin."""
    pts, iv = _frames(spark)
    plan = (
        interval_join(pts, iv, "t", "s", "e", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    naive_plan = (
        _naive(pts, iv, False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # what we avoided: the naive BETWEEN join is nested-loop shaped
    assert (
        "BroadcastNestedLoopJoin" in naive_plan
        or "CartesianProduct" in naive_plan
    )


def test_bad_width_rejected(spark):
    pts, iv = _frames(spark)
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(pts, iv, "t", "s", "e", 0)


def test_keys_beyond_double_precision(spark):
    """Regression: bucketing used to round-trip through double, which
    collapses adjacent integers past 2^53 — a point one past an interval
    end could land in (or out of) the wrong bucket.  Integral keys must
    bucket via exact long arithmetic."""
    base = 2**60  # far past double's 2^53 integer-exact range
    pts = spark.createDataFrame(
        [(i, base + i) for i in range(8)], "pid long, t long"
    )
    iv = spark.createDataFrame(
        [(0, base + 2, base + 5), (1, base - 3, base + 100)],
        "iid long, s long, e long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, "t", "s", "e", 3).collect()
    )
    exp = sorted(
        [(i, 0) for i in range(2, 5)] + [(i, 1) for i in range(8)]
    )
    assert got == exp


def test_negative_integral_keys_floor_not_trunc(spark):
    """Floor-division semantics for negative keys: -1 with width 4 is
    bucket -1, not 0 (trunc would merge it with [0, 4))."""
    pts = spark.createDataFrame([(0, -1), (1, 1)], "pid long, t long")
    iv = spark.createDataFrame([(0, -4, 0), (1, 0, 4)], "iid long, s long, e long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, "t", "s", "e", 4).collect()
    )
    assert got == [(0, 0), (1, 1)]


def test_case_insensitive_column_resolution(spark):
    """r8 review: dtype lookup must mirror Spark's case-insensitive
    column resolution (F.col('T') finds column 't')."""
    pts = spark.createDataFrame([(1, 5)], "pid long, t long")
    iv = spark.createDataFrame([(0, 0, 10)], "iid long, s long, e long")
    got = interval_join(pts, iv, "T", "S", "E", 4).collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(1, 0)]


def test_fractional_bucket_width(spark):
    """r8 review: a float width on integral keys must keep the double
    floor path (the integral `div` rejects DOUBLE operands)."""
    pts = spark.createDataFrame([(i, i) for i in range(6)], "pid long, t long")
    iv = spark.createDataFrame([(0, 1, 4)], "iid long, s long, e long")
    got = sorted(
        r["pid"] for r in interval_join(pts, iv, "t", "s", "e", 0.5).collect()
    )
    assert got == [1, 2, 3]
