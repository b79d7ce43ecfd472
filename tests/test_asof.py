"""As-of join: semantics (backward inclusive, ties, misses, tolerance)
pinned on small frames; oracle parity vs DuckDB's native ASOF JOIN runs in
test_oracle_parity (aj1_asof_join)."""

from __future__ import annotations

import datetime as dt

from tulflow_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00:00")),
            (2, "k1", _ts("2024-01-01T12:00:00")),
            (3, "k2", _ts("2024-01-01T11:00:00")),
            (4, "k3", _ts("2024-01-01T11:00:00")),  # key with no right rows
        ],
        "id INT, k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T09:30:00"), 1.0),
            ("k1", _ts("2024-01-01T10:00:00"), 2.0),  # tie with left id=1
            ("k1", _ts("2024-01-01T11:30:00"), 3.0),
            ("k2", _ts("2024-01-01T11:30:00"), 9.0),  # after k2's only left row
        ],
        "k STRING, ts TIMESTAMP, v DOUBLE",
    )
    return left, right


def test_backward_inclusive_match(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    payload=["v"])
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 4  # every left row survives (left join)
    # tie at 10:00 matches inclusively (>=), picking the equal-ts right row
    assert rows[1]["asof_v"] == 2.0
    assert rows[1]["asof_ts"] == _ts("2024-01-01T10:00:00")
    # newest at-or-before 12:00 is 11:30
    assert rows[2]["asof_v"] == 3.0
    # k2's only right row is in the future -> no match
    assert rows[3]["asof_v"] is None and rows[3]["asof_ts"] is None
    # key absent from right -> no match
    assert rows[4]["asof_v"] is None


def test_tolerance_bounds_lookback(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    payload=["v"], tolerance=dt.timedelta(minutes=45))
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["asof_v"] == 2.0  # 0 min gap: kept
    assert rows[2]["asof_v"] == 3.0  # 30 min gap: kept
    # widen: id=2 matched 11:30 (30 min); shrink tolerance below that
    out2 = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                     payload=["v"], tolerance=dt.timedelta(minutes=10))
    rows2 = {r["id"]: r for r in out2.collect()}
    assert rows2[2]["asof_v"] is None  # 30 min gap > 10 min tolerance
    assert rows2[1]["asof_v"] == 2.0  # exact tie: zero gap survives


def test_sub_millisecond_tolerance(spark):
    """Sub-ms timedeltas must not be formatted into an INTERVAL literal
    (scientific notation '1e-06' fails Spark's interval parser; r3 ADVICE).
    F.lit(timedelta) keeps microsecond precision."""
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    payload=["v"], tolerance=dt.timedelta(microseconds=1))
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["asof_v"] == 2.0  # exact tie: 0 gap <= 1 microsecond
    assert rows[2]["asof_v"] is None  # 30 min gap > 1 microsecond


def test_left_columns_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    payload=["v"])
    assert out.columns == ["id", "k", "ts", "asof_ts", "asof_v"]
    assert out.count() == left.count()


def test_null_payload_carried_atomically(spark):
    """A matching right row whose payload value is legitimately NULL must
    carry that NULL — not silently fall back to an older right row's value
    (r2 ADVICE: per-column last(ignorenulls) mixed rows)."""
    left = spark.createDataFrame(
        [(1, "k1", _ts("2024-01-01T12:00:00"))], "id INT, k STRING, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T10:00:00"), 1.0, "old"),
            ("k1", _ts("2024-01-01T11:00:00"), None, "new"),  # newest match
        ],
        "k STRING, ts TIMESTAMP, v DOUBLE, label STRING",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    payload=["v", "label"])
    row = out.collect()[0]
    assert row["asof_ts"] == _ts("2024-01-01T11:00:00")
    assert row["asof_label"] == "new"
    assert row["asof_v"] is None  # NOT 1.0 from the stale 10:00 row


def test_single_shuffle_plan(spark):
    """The union-tag rewrite must cost ONE exchange (the window partition) —
    no range-join pair explosion, no extra shuffle."""
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    payload=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
