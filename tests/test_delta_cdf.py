"""Delta Change Data Feed (`ext/delta_log.py::read_delta_cdf`):
per-version change resolution — cdc files, derived inserts, full-file
deletes, deletion-vector diffs, and the typed underivable-rewrite
wall."""

from __future__ import annotations

import glob
import json
import os

import pytest

from tulflow_spark.ext.delta_log import (
    DeltaProtocolError,
    _replay,
    delete_rows_with_dv,
    delete_where,
    read_delta,
    read_delta_cdf,
    write_delta,
)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)], "id long, v string")


def _changes(df):
    return sorted((r["_commit_version"], r["_change_type"], r["id"])
                  for r in df.collect())


def test_cdf_inserts_cdc_deletes_and_windows(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 20), t, mode="append",
                configuration={"delta.enableChangeDataFeed": "true"})
    write_delta(_df(spark, 20, 40), t, mode="append")
    delete_where(spark, t, "id % 5 = 0")        # v2: cdc file
    got = _changes(read_delta_cdf(spark, t, -1))
    want = sorted(
        [(0, "insert", i) for i in range(20)]
        + [(1, "insert", i) for i in range(20, 40)]
        + [(2, "delete", i) for i in range(0, 40, 5)])
    assert got == want
    # cdc part file(s) exist under _change_data, none empty
    cdcs = glob.glob(f"{t}/_change_data/cdc-*.parquet")
    assert cdcs and all(os.path.getsize(c) > 0 for c in cdcs)
    # windowed read delivers only the window
    assert _changes(read_delta_cdf(spark, t, 1, 2)) == \
        [(2, "delete", i) for i in range(0, 40, 5)]
    # empty window → empty frame with the full CDF schema
    empty = read_delta_cdf(spark, t, 2, 2)
    assert empty.count() == 0
    assert empty.columns == ["id", "v", "_change_type",
                             "_commit_version"]
    # the CDF matches the table state: inserts minus deletes == live
    live = {r["id"] for r in read_delta(spark, t).collect()}
    ins = {i for v, c, i in got if c == "insert"}
    dels = {i for v, c, i in got if c == "delete"}
    assert ins - dels == live


def test_cdf_dv_diff_deletes(spark, tmp_path):
    """DV commits derive per-row deletes from the vector DIFF — and a
    second DV on the same file delivers only the NEWLY dead rows."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 12).coalesce(1), t, mode="append")
    (ap,) = _replay(spark, t, None).live
    delete_rows_with_dv(spark, t, {ap: [0, 1]})        # v1
    delete_rows_with_dv(spark, t, {ap: [1, 2, 3]})     # v2: new = {2,3}
    got = _changes(read_delta_cdf(spark, t, 0))
    by_v = {}
    for v, c, i in got:
        assert c == "delete"
        by_v.setdefault(v, set()).add(i)
    assert len(by_v[1]) == 2
    assert len(by_v[2]) == 2 and not (by_v[1] & by_v[2])
    # full-file remove of a DV'd file delivers only SURVIVORS:
    # rewrite-without-cdc is typed, so pin via a hand-built commit
    # that purely removes the file
    latest = 2
    with open(f"{t}/_delta_log/{latest + 1:020d}.json", "w") as fh:
        fh.write(json.dumps({"remove": {
            "path": ap, "dataChange": True,
            "deletionTimestamp": 0}}) + "\n")
    tail = _changes(read_delta_cdf(spark, t, 2))
    dead = by_v[1] | by_v[2]
    assert {i for _, _, i in tail} == \
        {r["id"] for r in read_delta(spark, t, version=2).collect()}
    assert not ({i for _, _, i in tail} & dead)


def test_cdf_typed_walls(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 12), t, mode="append")
    # rewrite without cdc (CDF property off) → typed
    delete_where(spark, t, "id = 3")
    with pytest.raises(DeltaProtocolError, match="not derivable"):
        read_delta_cdf(spark, t, 0).collect()
    # out-of-bounds window
    with pytest.raises(DeltaProtocolError, match="out of bounds"):
        read_delta_cdf(spark, t, 0, 99)
    # vacuumed cdc file → typed
    t2 = str(tmp_path / "t2")
    write_delta(_df(spark, 0, 12), t2, mode="append",
                configuration={"delta.enableChangeDataFeed": "true"})
    delete_where(spark, t2, "id = 3")
    for cdc in glob.glob(f"{t2}/_change_data/cdc-*.parquet"):
        os.remove(cdc)
    with pytest.raises(DeltaProtocolError, match="vacuumed"):
        read_delta_cdf(spark, t2, -1)
    # configuration on an existing table → typed
    with pytest.raises(DeltaProtocolError, match="table creation"):
        write_delta(_df(spark, 0, 2), t2, mode="append",
                    configuration={"x": "y"})


def test_cdf_partitioned_and_foreign_cdc(spark, tmp_path):
    """Partition columns come back as typed literals on derived
    frames, and a FOREIGN cdc file relying on partitionValues
    injection (partition column absent from the file) reads."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"x{i}", i % 2) for i in range(10)],
        "id long, v string, g long")
    write_delta(df, t, mode="append", partition_by=["g"],
                configuration={"delta.enableChangeDataFeed": "true"})
    got = read_delta_cdf(spark, t, -1)
    assert sorted(r["g"] for r in got.collect()) == [0] * 5 + [1] * 5
    # hand-built foreign cdc commit: file lacks the partition column
    os.makedirs(f"{t}/_change_data", exist_ok=True)
    pq.write_table(pa.table({
        "id": pa.array([99], pa.int64()),
        "v": pa.array(["gone"]),
        "_change_type": pa.array(["delete"]),
    }), f"{t}/_change_data/cdc-foreign.parquet")
    sz = os.path.getsize(f"{t}/_change_data/cdc-foreign.parquet")
    with open(f"{t}/_delta_log/{1:020d}.json", "w") as fh:
        fh.write(json.dumps({"cdc": {
            "path": "_change_data/cdc-foreign.parquet",
            "partitionValues": {"g": "1"}, "size": sz,
            "dataChange": False}}) + "\n")
    tail = read_delta_cdf(spark, t, 0).collect()
    (row,) = tail
    assert (row["id"], row["g"], row["_change_type"],
            row["_commit_version"]) == (99, 1, "delete", 1)


def test_timestamp_time_travel(spark, tmp_path):
    """`read_delta(as_of_ms=)`: inCommitTimestamp wins over
    commitInfo.timestamp wins over file mtime; non-monotone mtimes
    normalize per the spec rule."""
    import time

    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 10), t, mode="append")          # v0
    write_delta(_df(spark, 10, 20), t, mode="append")         # v1
    write_delta(_df(spark, 20, 30), t, mode="append")         # v2
    # pin explicit commitInfo timestamps by appending to the commits
    # (protocol: commitInfo may appear anywhere in the commit)
    for v, ts in ((0, 1000), (1, 2000)):
        with open(f"{t}/_delta_log/{v:020d}.json", "a") as fh:
            fh.write("\n" + json.dumps(
                {"commitInfo": {"timestamp": ts}}))
    with open(f"{t}/_delta_log/{2:020d}.json", "a") as fh:
        fh.write("\n" + json.dumps({"commitInfo": {
            "timestamp": 1,                       # skewed clock
            "inCommitTimestamp": 3000}}))         # ICT wins
    from tulflow_spark.ext.delta_log import delta_version_as_of

    assert delta_version_as_of(t, 1000) == 0
    assert delta_version_as_of(t, 2999) == 1
    assert delta_version_as_of(t, 3000) == 2
    assert read_delta(spark, t, as_of_ms=2500).count() == 20
    with pytest.raises(DeltaProtocolError, match="at or before"):
        delta_version_as_of(t, 999)
    with pytest.raises(DeltaProtocolError, match="mutually exclusive"):
        read_delta(spark, t, version=1, as_of_ms=2500)
    # file-mtime fallback: strip commitInfo, set mtimes NON-monotone;
    # the monotone rule makes v1's effective ts max(5000, 4000)=5000
    for v, mt in ((0, 5.0), (1, 4.0), (2, 6.0)):
        p = f"{t}/_delta_log/{v:020d}.json"
        lines = [ln for ln in open(p).read().splitlines()
                 if ln.strip() and "commitInfo" not in ln]
        with open(p, "w") as fh:
            fh.write("\n".join(lines))
        os.utime(p, (mt, mt))
    assert delta_version_as_of(t, 5500) == 1
    assert delta_version_as_of(t, 5000) == 1   # both eff 5000 → newest
    with pytest.raises(DeltaProtocolError, match="at or before"):
        delta_version_as_of(t, 4500)           # v0 eff is 5000


def test_ict_transition_resets_monotone_max(spark, tmp_path):
    """Non-ICT→ICT transition: a skewed (inflated) pre-ICT timestamp
    must NOT carry into the first ICT commits through the monotone-max
    rule — ICT is writer-guaranteed monotone and authoritative, so the
    running max resets at every ICT commit (r12 VERDICT wrong #2)."""
    from tulflow_spark.ext.delta_log import delta_version_as_of

    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 5), t, mode="append")           # v0
    write_delta(_df(spark, 5, 10), t, mode="append")          # v1
    write_delta(_df(spark, 10, 15), t, mode="append")         # v2
    # v0: non-ICT with a badly skewed-forward clock; v1/v2: ICT
    stamps = (
        (0, {"timestamp": 9_000}),
        (1, {"timestamp": 1, "inCommitTimestamp": 2_000}),
        (2, {"timestamp": 2, "inCommitTimestamp": 3_000}),
    )
    for v, ci in stamps:
        with open(f"{t}/_delta_log/{v:020d}.json", "a") as fh:
            fh.write("\n" + json.dumps({"commitInfo": ci}))
    # under the old max-carry rule v1's effective ts would have been
    # max(9000, 2000) = 9000 and the 2500 probe would miss it
    assert delta_version_as_of(t, 2500) == 1
    assert delta_version_as_of(t, 3000) == 2
    assert delta_version_as_of(t, 9000) == 2   # ICT stays authoritative


def test_partitioned_delete_where_with_cdf(spark, tmp_path):
    """r12: delete_where works on partitioned tables — the predicate
    may reference partition columns (injected as typed literals),
    only matched partitions rewrite, cdc files stay hive-shaped
    (partitionValues in the action, column not materialized), and
    read_delta_cdf round-trips the whole change stream."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"x{i}", i % 3) for i in range(30)],
        "id long, v string, g long")
    write_delta(df, t, mode="append", partition_by=["g"],
                configuration={"delta.enableChangeDataFeed": "true"})
    # predicate mixes a partition column and a data column
    delete_where(spark, t, "g = 1 AND id < 10")
    live = sorted((r["id"], r["g"])
                  for r in read_delta(spark, t).collect())
    want = sorted((i, i % 3) for i in range(30)
                  if not (i % 3 == 1 and i < 10))
    assert live == want
    # untouched partitions carried over BY REFERENCE (no rewrite)
    snap = _replay(spark, t, None)
    untouched = [p for p in snap.live if "g=0" in p or "g=2" in p]
    assert all(p.startswith("commit-") for p in untouched)
    assert len({p.split("/")[0] for p in untouched}) == 1  # original
    # partition-only predicate drops the whole partition
    delete_where(spark, t, "g = 2")
    assert sorted(r["g"] for r in
                  read_delta(spark, t).collect()) == \
        sorted([0] * 10 + [1] * 7)
    # the feed delivered every change with correct partition values
    got = read_delta_cdf(spark, t, 0)
    dels = sorted((r["id"], r["g"], r["_commit_version"])
                  for r in got.collect()
                  if r["_change_type"] == "delete")
    want_d = sorted([(i, 1, 1) for i in range(30)
                     if i % 3 == 1 and i < 10]
                    + [(i, 2, 2) for i in range(30) if i % 3 == 2])
    assert dels == want_d
    # cdc actions carry partitionValues; files lack the column
    import pyarrow.parquet as pq

    for cdc in glob.glob(f"{t}/_change_data/cdc-*.parquet"):
        assert "g" not in pq.read_schema(cdc).names


def test_cdf_restore_by_dropping_dv_and_checkpoint_window(spark,
                                                          tmp_path):
    """r12 review round 2: (a) a same-path re-add WITHOUT a DV (the
    real RESTORE shape) emits the previously-dead rows as inserts;
    (b) a CDF window above a checkpoint works after the pre-checkpoint
    JSON is cleaned up (prev-state resumes from the checkpoint)."""
    from tulflow_spark.ext.delta_log import (
        enable_v2_checkpoints,
        write_checkpoint_v2,
    )

    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 8).coalesce(1), t, mode="append")  # v0
    (ap,) = _replay(spark, t, None).live
    delete_rows_with_dv(spark, t, {ap: [0, 2]})                  # v1
    # v2: hand-built restore — re-add the SAME path without a DV
    snap = _replay(spark, t, None)
    add = {k: v for k, v in snap.live[ap].items()
           if k != "deletionVector" and v is not None}
    add["dataChange"] = True
    with open(f"{t}/_delta_log/{2:020d}.json", "w") as fh:
        fh.write(json.dumps({"remove": {
            "path": ap, "dataChange": True,
            "deletionTimestamp": 0}}) + "\n")
        fh.write(json.dumps({"add": add}) + "\n")
    got = _changes(read_delta_cdf(spark, t, 1))
    assert [(v, c) for v, c, _ in got] == [(2, "insert")] * 2
    assert read_delta(spark, t).count() == 8     # fully restored
    # (b): V2 checkpoint (the DV table's only checkpoint form), clean
    # the JSON below it, window above it resumes from the checkpoint
    enable_v2_checkpoints(spark, t)                              # v3
    cv = write_checkpoint_v2(spark, t, sidecars=1)
    delete_rows_with_dv(spark, t, {ap: [5]})                     # v4
    for v in range(0, cv + 1):
        os.remove(f"{t}/_delta_log/{v:020d}.json")
    got = _changes(read_delta_cdf(spark, t, cv))
    by = {}
    for v, c, i in got:
        by.setdefault((v, c), set()).add(i)
    assert list(by) == [(4, "delete")]
    assert len(by[(4, "delete")]) == 1


def test_cdf_column_mapping_name_mode_across_rename(spark, tmp_path):
    """r12 VERDICT missing #4: the change feed works on column-mapped
    (mode=name) tables — resolution runs in physical name space, so a
    feed crossing a mid-history RENAME delivers every vintage under
    the current logical names.  History is foreign-shaped (hand-
    authored commits): mapped tables are read-only to this module's
    writers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_column_mapped_fixture(spark, df, t)                  # v0
    # v1: foreign append — data file carries PHYSICAL names
    fp = f"{t}/part-foreign.parquet"
    pq.write_table(pa.table({
        "col-0000": pa.array([3], pa.int64()),
        "col-0001": pa.array(["c"]),
    }), fp)
    with open(f"{t}/_delta_log/{1:020d}.json", "w") as fh:
        fh.write(json.dumps({"add": {
            "path": "part-foreign.parquet", "partitionValues": {},
            "size": os.path.getsize(fp), "modificationTime": 0,
            "dataChange": True}}) + "\n")
    # v2: RENAME v -> val (same physicalName) via a fresh metaData
    v0 = [json.loads(ln) for ln in open(f"{t}/_delta_log/{0:020d}.json")
          if ln.strip()]
    meta = next(a["metaData"] for a in v0 if a.get("metaData"))
    sch = json.loads(meta["schemaString"])
    assert sch["fields"][1]["name"] == "v"
    sch["fields"][1]["name"] = "val"
    meta2 = dict(meta, schemaString=json.dumps(sch))
    with open(f"{t}/_delta_log/{2:020d}.json", "w") as fh:
        fh.write(json.dumps({"metaData": meta2}) + "\n")
    # v3: foreign cdc commit with update images, physical names
    os.makedirs(f"{t}/_change_data", exist_ok=True)
    cp = f"{t}/_change_data/cdc-m.parquet"
    pq.write_table(pa.table({
        "col-0000": pa.array([2, 2], pa.int64()),
        "col-0001": pa.array(["b", "B"]),
        "_change_type": pa.array(["update_preimage",
                                  "update_postimage"]),
    }), cp)
    with open(f"{t}/_delta_log/{3:020d}.json", "w") as fh:
        fh.write(json.dumps({"cdc": {
            "path": "_change_data/cdc-m.parquet",
            "partitionValues": {}, "size": os.path.getsize(cp),
            "dataChange": False}}) + "\n")
    feed = read_delta_cdf(spark, t, -1)
    assert feed.columns == ["id", "val", "_change_type",
                            "_commit_version"]
    got = sorted((r["_commit_version"], r["_change_type"], r["id"],
                  r["val"]) for r in feed.collect())
    assert got == [
        (0, "insert", 1, "a"), (0, "insert", 2, "b"),
        (1, "insert", 3, "c"),
        (3, "update_postimage", 2, "B"),
        (3, "update_preimage", 2, "b"),
    ]
    # windows resolve under the schema AT to_version: below the
    # rename the column is still `v`, above it `val`
    below = read_delta_cdf(spark, t, 0, 1)
    assert below.columns[:2] == ["id", "v"]
    assert [r["v"] for r in below.collect()] == ["c"]
    assert len(read_delta_cdf(spark, t, 1, 2).collect()) == 0
    assert read_delta_cdf(spark, t, 1, 3).columns[:2] == ["id", "val"]


def test_cdf_column_mapping_id_mode_stays_typed(spark, tmp_path):
    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    t = str(tmp_path / "t")
    write_column_mapped_fixture(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"),
        t, mode="id")
    with pytest.raises(DeltaProtocolError, match="mode='id'"):
        read_delta_cdf(spark, t, -1)


def test_cdf_file_frame_rejects_unfiltered_schema(spark, tmp_path):
    """_cdf_file_frame appends partition/CDF metadata columns with one
    select('*', ...), which is only equivalent to the old withColumn
    chain because data_schema excludes them — the guard (r15 ADVICE)
    must fail typed if a caller ever passes an unfiltered schema."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from tulflow_spark.ext.delta_log import (
        DeltaProtocolError,
        _cdf_file_frame,
        write_delta,
    )

    t = str(tmp_path / "tbl")
    write_delta(spark.createDataFrame([(1, "a")], "id long, p string"),
                t, partition_by=["p"])
    import json as _json
    import os as _os

    with open(_os.path.join(t, "_delta_log",
                            "00000000000000000000.json")) as fh:
        adds = [_json.loads(ln)["add"] for ln in fh
                if '"add"' in ln]
    bad = StructType([StructField("id", LongType()),
                      StructField("p", StringType())])  # includes part col
    with pytest.raises(DeltaProtocolError, match="must exclude"):
        _cdf_file_frame(spark, t, adds[0], bad,
                        {"id": LongType(), "p": StringType()}, ["p"],
                        "insert", 0)
