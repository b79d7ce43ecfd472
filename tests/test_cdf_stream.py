"""sources/lake_stream.py: the ``tulflow_delta_cdf`` streaming source —
full-fidelity change rows (insert / delete / update images / DV diffs)
delivered through Structured Streaming with exactly-once offsets and
admission control, matching the batch `read_delta_cdf` content."""

from __future__ import annotations

import json
import os

import pytest

from tulflow_spark.ext.delta_log import (
    delete_rows_with_dv,
    delete_where,
    merge_delta,
    read_delta_cdf,
    write_delta,
)
from tulflow_spark.sources.lake_stream import DeltaCdfSource

CDF = {"delta.enableChangeDataFeed": "true"}


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)], "id long, v string")


def _chg(spark, rows):
    return spark.createDataFrame(rows, "id long, v string, op string")


def _rows(it):
    return sorted((r["_commit_version"], r["_change_type"], r["id"],
                   r["v"]) for r in it)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(DeltaCdfSource)
    return spark


def _drain(spark, path, name, ckpt=None, out=None, **opts):
    """One availableNow pass; memory sink by default, or (with
    ``ckpt``+``out``) a restart-capable parquet sink — memory sinks
    cannot recover from a checkpoint.  Returns ALL rows so far."""
    reader = (spark.readStream.format("tulflow_delta_cdf")
              .option("path", path).option("startingVersion", "-1"))
    for k, val in opts.items():
        reader = reader.option(k, val)
    if ckpt:
        q = (reader.load().writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        try:
            return _rows(spark.read.parquet(out).collect())
        except Exception:
            return []          # sink dir still empty
    q = (reader.load().writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return _rows(spark.sql(f"select * from {name}").collect())


def test_cdf_stream_matches_batch(registered, tmp_path):
    """Inserts, cdc deletes and MERGE update images arrive through the
    stream exactly as the batch reader delivers them."""
    spark = registered
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 6), t, mode="append",
                configuration=CDF)                            # v0
    write_delta(_df(spark, 6, 9), t, mode="append")           # v1
    delete_where(spark, t, "id % 4 = 0")                      # v2
    merge_delta(spark, t, _chg(spark, [
        (1, "U1", "U"), (99, "n", "I"), (2, None, "D")]),
        keys=["id"])                                          # v3
    want = _rows(read_delta_cdf(spark, t, -1).collect())
    got = _drain(spark, t, "cdf_mb")
    assert got == want
    assert {c for _, c, _, _ in got} == {
        "insert", "delete", "update_preimage", "update_postimage"}


def test_cdf_stream_exactly_once_with_deletes(registered, tmp_path):
    """Restart from the same checkpoint: only NEW change versions
    arrive — including delete and merge commits (the sdc1 recipe,
    with deletes; r12 VERDICT #3)."""
    spark = registered
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_delta(_df(spark, 0, 6), t, mode="append",
                configuration=CDF)                            # v0
    got = _drain(spark, t, "cdf_eo", ckpt=ckpt, out=out)
    assert got == _rows(read_delta_cdf(spark, t, -1).collect())
    delete_where(spark, t, "id >= 4")                         # v1
    merge_delta(spark, t, _chg(spark, [(0, "Z", "U")]),
                keys=["id"])                                  # v2
    got = _drain(spark, t, "cdf_eo", ckpt=ckpt, out=out)
    assert got == _rows(read_delta_cdf(spark, t, -1).collect())
    # nothing new → nothing re-delivered
    assert _drain(spark, t, "cdf_eo", ckpt=ckpt, out=out) == got


def test_cdf_stream_dv_diff(registered, tmp_path):
    """Deletion-vector commits stream as per-row DV-diff deletes."""
    from tulflow_spark.ext.delta_log import _replay

    spark = registered
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 8).coalesce(1), t, mode="append")
    (ap,) = _replay(spark, t, None).live
    delete_rows_with_dv(spark, t, {ap: [1, 3]})               # v1
    delete_rows_with_dv(spark, t, {ap: [3, 5]})               # v2
    want = _rows(read_delta_cdf(spark, t, -1).collect())
    got = _drain(spark, t, "cdf_dv")
    assert got == want
    assert [(c, i) for v, c, i, _ in got if v == 2] == \
        [("delete", 5)]


def test_cdf_stream_admission_control(registered, tmp_path):
    """maxVersionsPerBatch caps each micro-batch; the backlog drains
    over several batches with no duplicates."""
    import glob

    spark = registered
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_delta(_df(spark, 0, 2), t, mode="append",
                configuration=CDF)                            # v0
    for k in range(1, 6):                                     # v1..v5
        write_delta(_df(spark, 2 * k, 2 * k + 2), t, mode="append")
    delete_where(spark, t, "id = 0")                          # v6
    got = _drain(spark, t, "cdf_ac", ckpt=ckpt, out=out,
                 maxVersionsPerBatch="2")
    partial = len(glob.glob(f"{ckpt}/offsets/*"))
    assert partial == 1 and max(v for v, _, _, _ in got) <= 1
    while _drain(spark, t, "cdf_ac", ckpt=ckpt, out=out,
                 maxVersionsPerBatch="2") != \
            _rows(read_delta_cdf(spark, t, -1).collect()):
        assert len(glob.glob(f"{ckpt}/offsets/*")) <= 8
    assert len(glob.glob(f"{ckpt}/offsets/*")) >= 4


def test_cdf_stream_underivable_rewrite_fails_typed(registered,
                                                    tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 6), t, mode="append")   # CDF off
    delete_where(spark, t, "id = 2")                  # rewrite, no cdc
    q = (spark.readStream.format("tulflow_delta_cdf")
         .option("path", t).option("startingVersion", "-1").load()
         .writeStream.format("memory").queryName("cdf_wall")
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="not derivable"):
        q.awaitTermination(180)


def test_cdf_stream_column_mapped_rename(registered, tmp_path):
    """Mode=name mapped table with a mid-history rename: the stream
    binds physically and delivers under the CURRENT logical names."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    spark = registered
    t = str(tmp_path / "t")
    write_column_mapped_fixture(
        spark, spark.createDataFrame([(1, "a"), (2, "b")],
                                     "id long, v string"), t)  # v0
    v0 = [json.loads(ln) for ln in open(f"{t}/_delta_log/{0:020d}.json")
          if ln.strip()]
    meta = next(a["metaData"] for a in v0 if a.get("metaData"))
    sch = json.loads(meta["schemaString"])
    sch["fields"][1]["name"] = "val"
    with open(f"{t}/_delta_log/{1:020d}.json", "w") as fh:      # v1
        fh.write(json.dumps({"metaData": dict(
            meta, schemaString=json.dumps(sch))}) + "\n")
    os.makedirs(f"{t}/_change_data", exist_ok=True)
    cp = f"{t}/_change_data/cdc-m.parquet"
    pq.write_table(pa.table({
        "col-0000": pa.array([2, 2], pa.int64()),
        "col-0001": pa.array(["b", "B"]),
        "_change_type": pa.array(["update_preimage",
                                  "update_postimage"]),
    }), cp)
    with open(f"{t}/_delta_log/{2:020d}.json", "w") as fh:      # v2
        fh.write(json.dumps({"cdc": {
            "path": "_change_data/cdc-m.parquet",
            "partitionValues": {}, "size": os.path.getsize(cp),
            "dataChange": False}}) + "\n")
    got = (spark.readStream.format("tulflow_delta_cdf")
           .option("path", t).option("startingVersion", "-1").load())
    assert got.columns == ["id", "val", "_change_type",
                           "_commit_version"]
    q = (got.writeStream.format("memory").queryName("cdf_cm")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = sorted((r["_commit_version"], r["_change_type"], r["id"],
                   r["val"])
                  for r in spark.sql("select * from cdf_cm").collect())
    assert rows == [
        (0, "insert", 1, "a"), (0, "insert", 2, "b"),
        (2, "update_postimage", 2, "B"),
        (2, "update_preimage", 2, "b"),
    ]


def test_cdf_stream_partitioned_injection(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"x{i}", i % 2) for i in range(8)],
        "id long, v string, g long")
    write_delta(df, t, mode="append", partition_by=["g"],
                configuration=CDF)
    merge_delta(spark, t, spark.createDataFrame(
        [(3, "Y", 1, "U")], "id long, v string, g long, op string"),
        keys=["id"])
    q = (spark.readStream.format("tulflow_delta_cdf")
         .option("path", t).option("startingVersion", "-1").load()
         .writeStream.format("memory").queryName("cdf_part")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from cdf_part").collect()
    assert all(r["g"] == (r["id"] % 2 if r["id"] < 8 else r["g"])
               for r in rows)
    upd = sorted((r["_change_type"], r["id"], r["g"]) for r in rows
                 if r["_commit_version"] == 1)
    assert upd == [("update_postimage", 3, 1),
                   ("update_preimage", 3, 1)]


def test_cdf_apply_sink_end_to_end(registered, tmp_path):
    """The full CDC loop: upstream Delta commits (insert / delete /
    MERGE) → tulflow_delta_cdf stream → delta_cdf_apply_sink → the
    downstream table CONVERGES to the upstream state, exactly once
    across restarts."""
    from tulflow_spark.ext.delta_log import (
        _replay,
        delta_cdf_apply_sink,
        latest_version,
        read_delta,
    )

    spark = registered
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    def state(t):
        return sorted((r["id"], r["v"])
                      for r in read_delta(spark, t).collect())

    def drain():
        q = (spark.readStream.format("tulflow_delta_cdf")
             .option("path", src).option("startingVersion", "-1")
             .load().writeStream
             .foreachBatch(delta_cdf_apply_sink(dst, "apply", ["id"]))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    write_delta(_df(spark, 0, 8), src, mode="append",
                configuration=CDF)                            # v0
    drain()
    assert state(dst) == state(src)
    # new upstream commits incl. deletes and update images
    delete_where(spark, src, "id % 3 = 0")                    # v1
    merge_delta(spark, src, _chg(spark, [
        (1, "U1", "U"), (50, "n", "I"), (2, None, "D")]),
        keys=["id"])                                          # v2
    before = latest_version(dst)
    drain()
    assert state(dst) == state(src)
    # exactly-once: watermark recorded, replays change nothing
    applied = latest_version(dst)
    assert applied > before
    assert _replay(spark, dst, applied).txns["apply"] >= 1
    drain()
    assert latest_version(dst) == applied
    assert state(dst) == state(src)


def test_cdf_apply_sink_collapses_within_batch(registered, tmp_path):
    """One drained batch spanning several versions applies only the
    FINAL action per key (newest version wins; a surviving image
    beats same-version deletes from a multi-row collapse)."""
    from tulflow_spark.ext.delta_log import (
        delta_cdf_apply_sink,
        latest_version,
        read_delta,
    )

    spark = registered
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta(_df(spark, 0, 4), src, mode="append",
                configuration=CDF)                            # v0
    merge_delta(spark, src, _chg(spark, [(1, "a1", "U")]),
                keys=["id"])                                  # v1
    merge_delta(spark, src, _chg(spark, [(1, None, "D"),
                                         (2, "b2", "U")]),
                keys=["id"])                                  # v2
    merge_delta(spark, src, _chg(spark, [(1, "back", "I")]),
                keys=["id"])                                  # v3
    q = (spark.readStream.format("tulflow_delta_cdf")
         .option("path", src).option("startingVersion", "-1")
         .load().writeStream
         .foreachBatch(delta_cdf_apply_sink(dst, "apply2", ["id"]))
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    # ONE batch covered all four versions → dst seeded in one commit
    assert latest_version(dst) == 0
    assert sorted((r["id"], r["v"])
                  for r in read_delta(spark, dst).collect()) == \
        sorted((r["id"], r["v"])
               for r in read_delta(spark, src).collect())


def test_cdf_stream_ending_version_bound(registered, tmp_path):
    """endingVersion bounds a backfill window on the Delta CDF
    stream: commits past the bound never deliver."""
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck2")
    out = str(tmp_path / "out2")
    write_delta(_df(registered, 0, 2), t, mode="append",
                configuration=CDF)                            # v0
    write_delta(_df(registered, 2, 4), t, mode="append")      # v1
    write_delta(_df(registered, 4, 6), t, mode="append")      # v2
    got = _drain(registered, t, "b1", ckpt=ckpt, out=out,
                 endingVersion="1")
    assert [x[:3] for x in got] == sorted(
        (i // 2, "insert", i) for i in range(4))
    write_delta(_df(registered, 6, 8), t, mode="append")      # v3
    assert _drain(registered, t, "b2", ckpt=ckpt, out=out,
                  endingVersion="1") == got
