"""Salted-join equivalence on skewed data; streaming CDC snapshot sink."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pyspark.sql.functions as F
import pytest

from tulflow_spark.operators.skew import salted_join
from tulflow_spark.streaming.events import cdc_snapshot_sink


def test_salted_join_matches_plain_join(spark):
    # skewed: one key owns 90% of rows
    big = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)],
        "k int, payload int",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (999, "orphan")], "k int, name string"
    )
    for how in ("inner", "left"):
        plain = big.join(small, ["k"], how).groupBy("k", "name").count()
        salted = salted_join(big, small, ["k"], buckets=4, how=how).groupBy(
            "k", "name"
        ).count()
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how


def _ts(m):
    return datetime(2026, 4, 1, 0, m, tzinfo=timezone.utc)


def test_cdc_snapshot_sink(spark, tmp_path):
    """Change stream over two micro-batches: insert → update → delete →
    re-insert; the snapshot must always reflect the latest state per key."""
    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    snap = str(tmp_path / "snapshot")
    ddl = "k bigint, v string, ts timestamp, deleted boolean"

    # batch 1: k1 insert, k2 insert, k3 insert
    spark.createDataFrame(
        [(1, "a1", _ts(1), False), (2, "b1", _ts(1), False), (3, "c1", _ts(1), False)],
        ddl,
    ).coalesce(1).write.parquet(str(changes_dir / "b1"))
    # batch 2: k1 update, k2 delete, k4 insert
    spark.createDataFrame(
        [(1, "a2", _ts(2), False), (2, None, _ts(2), True), (4, "d1", _ts(2), False)],
        ddl,
    ).coalesce(1).write.parquet(str(changes_dir / "b2"))
    flat = tmp_path / "flat"
    flat.mkdir()
    i = 0
    for sub in ["b1", "b2"]:
        for f in os.listdir(changes_dir / sub):
            if f.endswith(".parquet"):
                os.link(changes_dir / sub / f, flat / f"{i:03d}.parquet")
                i += 1

    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = cdc_snapshot_sink(
        stream, snap, keys=["k"], order_by=["ts"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = {r.k: r.v for r in spark.read.parquet(snap).collect()}
    assert final == {1: "a2", 3: "c1", 4: "d1"}  # k2 deleted, k1 updated
