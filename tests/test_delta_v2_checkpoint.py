"""Delta V2 checkpoints (`ext/delta_log.py`): uuid-named checkpoint
files with checkpointMetadata + sidecar actions, the checkpoint form
that preserves table-features protocols (classic checkpoints refuse
them precisely because their schema would drop the feature lists).

Golden strategy: besides writer/reader roundtrips, a HAND-WRITTEN
JSON-form v2 checkpoint pins the reader against the protocol layout
independent of the writer."""

from __future__ import annotations

import glob
import json
import os

import pytest

from tulflow_spark.ext.delta_log import (
    DeltaProtocolError,
    _replay,
    _v2_checkpoint_candidates,
    delete_rows_with_dv,
    enable_v2_checkpoints,
    read_delta,
    write_checkpoint_v2,
    write_delta,
)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}", i % 3) for i in range(lo, hi)],
        "id long, v string, b long",
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _cleanup_log(t: str, upto: int) -> None:
    for f in glob.glob(f"{t}/_delta_log/*.json"):
        stem = os.path.basename(f)[:-5]
        if stem.isdigit() and int(stem) <= upto:
            os.remove(f)


def test_v2_checkpoint_roundtrip_with_dv_and_cleanup(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 30), t, mode="append",
                partition_by=["b"])
    write_delta(_df(spark, 30, 60), t, mode="append",
                partition_by=["b"])
    enable_v2_checkpoints(spark, t)
    snap = _replay(spark, t, None)
    ap = sorted(snap.live)[0]
    delete_rows_with_dv(spark, t, {ap: [0]})
    want = _ids(read_delta(spark, t))
    assert len(want) == 59
    cv = write_checkpoint_v2(spark, t, sidecars=2)
    _cleanup_log(t, cv)
    # resumed entirely from the v2 checkpoint: values, DV, protocol
    assert _ids(read_delta(spark, t)) == want
    snap2 = _replay(spark, t, None)
    assert "v2Checkpoint" in snap2.reader_features
    assert "deletionVectors" in snap2.reader_features
    assert snap2.min_reader == 3 and snap2.min_writer == 7
    assert any(a.get("deletionVector") for a in snap2.live.values())
    assert snap2.partition_cols == ["b"]
    # sparkless replay (the streaming planner path) sees the same state
    snap3 = _replay(None, t, None)
    assert sorted(snap3.live) == sorted(snap2.live)
    # partition pruning still runs off the checkpoint state
    assert read_delta(spark, t, prune=("b", 1, 1)).count() == 20
    # time travel below the cleaned-up horizon is a typed gap
    with pytest.raises(DeltaProtocolError, match="gap"):
        read_delta(spark, t, version=0)


def test_enable_walls_and_noop(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 6), t, mode="append")
    v = enable_v2_checkpoints(spark, t)
    assert enable_v2_checkpoints(spark, t) == v      # idempotent
    # legacy writer 5 (implicit column mapping capability) refuses
    t2 = str(tmp_path / "t2")
    write_delta(_df(spark, 0, 6), t2, mode="append")
    with open(f"{t2}/_delta_log/{1:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 5}}) + "\n")
    with pytest.raises(DeltaProtocolError, match="writer version 5"):
        enable_v2_checkpoints(spark, t2)
    # unknown declared feature refuses
    t3 = str(tmp_path / "t3")
    write_delta(_df(spark, 0, 6), t3, mode="append")
    with open(f"{t3}/_delta_log/{1:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["icebergCompatV2"]}}) + "\n")
    with pytest.raises(DeltaProtocolError, match="icebergCompatV2"):
        enable_v2_checkpoints(spark, t3)
    # v2 checkpoint without the feature refuses (t2 is the legacy
    # writer-5 table that never enabled it)
    with pytest.raises(DeltaProtocolError, match="v2Checkpoint"):
        write_checkpoint_v2(spark, t2)


def test_hand_written_json_v2_checkpoint(spark, tmp_path):
    """Reader golden: a JSON-form v2 checkpoint assembled by hand
    (action-per-line, uuid name, sidecar pointer) must resume the
    snapshot — pinning the layout independent of our parquet writer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 12), t, mode="append")
    snap = _replay(spark, t, None)
    want = _ids(read_delta(spark, t))
    log = f"{t}/_delta_log"
    os.makedirs(f"{log}/_sidecars", exist_ok=True)
    add_type = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
        ("stats", pa.string()),
    ])
    rows = [{"path": a["path"],
             "partitionValues": [],
             "size": int(a.get("size") or 0),
             "modificationTime": 0,
             "dataChange": False,
             "stats": a.get("stats")}
            for a in (snap.live[p] for p in sorted(snap.live))]
    pq.write_table(
        pa.table({"add": pa.array(rows, type=add_type)}),
        f"{log}/_sidecars/golden.parquet")
    sz = os.path.getsize(f"{log}/_sidecars/golden.parquet")
    lines = [
        {"checkpointMetadata": {"version": 0}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]}},
        {"metaData": {"id": "golden", "format": {"provider": "parquet"},
                      "schemaString": snap.schema_str,
                      "partitionColumns": [], "configuration": {}}},
        {"sidecar": {"path": "golden.parquet", "sizeInBytes": sz}},
    ]
    name = f"{0:020d}.checkpoint.abcdef0123456789.json"
    with open(f"{log}/{name}", "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines))
    with open(f"{log}/_last_checkpoint", "w") as fh:
        fh.write(json.dumps({"version": 0, "size": len(lines)}))
    _cleanup_log(t, 0)
    assert _ids(read_delta(spark, t)) == want
    # sparkless too
    assert sorted(_replay(None, t, None).live) == sorted(snap.live)
    # version mismatch between pointer and checkpointMetadata → typed
    with open(f"{log}/_last_checkpoint", "w") as fh:
        fh.write(json.dumps({"version": 1, "size": len(lines)}))
    os.rename(f"{log}/{name}",
              f"{log}/{1:020d}.checkpoint.abcdef0123456789.json")
    with pytest.raises(DeltaProtocolError, match="declares version"):
        read_delta(spark, t)


def test_v2_checkpoint_typed_walls(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 12), t, mode="append")
    enable_v2_checkpoints(spark, t)
    cv = write_checkpoint_v2(spark, t, sidecars=1)
    log = f"{t}/_delta_log"
    (ck,) = _v2_checkpoint_candidates(t, cv)
    # missing sidecar → typed
    (sc,) = glob.glob(f"{log}/_sidecars/*.parquet")
    moved = sc + ".bak"
    os.rename(sc, moved)
    with pytest.raises(DeltaProtocolError, match="sidecar missing"):
        read_delta(spark, t)
    os.rename(moved, sc)
    assert read_delta(spark, t).count() == 12
    # sidecar action without checkpointMetadata → typed (the
    # uuid-name wall fires first; the orphan-sidecar wall backstops
    # classic-named files)
    raw = [json.dumps({"sidecar": {"path": os.path.basename(sc),
                                   "sizeInBytes": 1}})]
    bad = f"{log}/{cv + 1:020d}.checkpoint.deadbeefdeadbeef.json"
    with open(bad, "w") as fh:
        fh.write("\n".join(raw))
    with open(f"{log}/_last_checkpoint", "w") as fh:
        fh.write(json.dumps({"version": cv + 1}))
    with pytest.raises(DeltaProtocolError,
                       match="without a checkpointMetadata"):
        read_delta(spark, t)


def test_uuid_named_checkpoint_requires_checkpoint_metadata(
        spark, tmp_path):
    """r12 review finding 2: a uuid-named checkpoint that lost its
    checkpointMetadata line must refuse typed — accepting it would
    also skip the version cross-check and let a stale body resume as
    the wrong version."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 6), t, mode="append")
    snap = _replay(spark, t, None)
    log = f"{t}/_delta_log"
    lines = [{"protocol": {"minReaderVersion": 1,
                           "minWriterVersion": 2}},
             {"metaData": {"id": "x",
                           "format": {"provider": "parquet"},
                           "schemaString": snap.schema_str,
                           "partitionColumns": [],
                           "configuration": {}}}] + [
        {"add": dict(snap.live[p], dataChange=False)}
        for p in sorted(snap.live)]
    with open(f"{log}/{0:020d}.checkpoint.deadbeef00.json", "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines))
    with open(f"{log}/_last_checkpoint", "w") as fh:
        fh.write(json.dumps({"version": 0}))
    with pytest.raises(DeltaProtocolError,
                       match="without a checkpointMetadata"):
        read_delta(spark, t)


def test_v2_writer_walls_on_unretained_features(spark, tmp_path):
    """r12 review finding 1: write_checkpoint_v2 refuses feature
    tables whose per-action state it does not retain (rowTracking,
    domainMetadata, ...) — a checkpoint that drops the state while
    declaring the feature corrupts the table at its next log
    cleanup."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 6), t, mode="append")
    with open(f"{t}/_delta_log/{1:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["v2Checkpoint", "rowTracking"]}}) + "\n")
    with pytest.raises(DeltaProtocolError, match="rowTracking"):
        write_checkpoint_v2(spark, t)


def test_writer1_migration_declares_nothing_extra(spark, tmp_path):
    """r12 review finding 4: a writer-version-1 table upgrades to
    writerFeatures [v2Checkpoint] alone — version 1 never implied
    appendOnly/invariants."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 6), t, mode="append")
    with open(f"{t}/_delta_log/{1:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 1}}) + "\n")
    enable_v2_checkpoints(spark, t)
    snap = _replay(spark, t, None)
    assert snap.writer_features == ["v2Checkpoint"]
    assert snap.reader_features == ["v2Checkpoint"]
    # and a writer-2 table DOES migrate its implied capabilities
    t2 = str(tmp_path / "t2")
    write_delta(_df(spark, 0, 6), t2, mode="append")
    enable_v2_checkpoints(spark, t2)
    snap2 = _replay(spark, t2, None)
    assert snap2.writer_features == [
        "appendOnly", "invariants", "v2Checkpoint"]


def test_v2_candidates_never_match_multipart(tmp_path):
    log = tmp_path / "t" / "_delta_log"
    log.mkdir(parents=True)
    names = [
        f"{5:020d}.checkpoint.parquet",                    # classic
        f"{5:020d}.checkpoint.0000000001.0000000002.parquet",  # part
        f"{5:020d}.checkpoint.0000000002.0000000002.parquet",
        f"{5:020d}.checkpoint.00c0ffee00c0ffee.parquet",   # v2
        f"{5:020d}.checkpoint.00c0ffee00c0ffee.json",      # v2 json
        f"{6:020d}.checkpoint.aaaaaaaaaaaaaaaa.parquet",   # other v
        f"{5:020d}.checkpoint.12345678901234567890123456789012"
        ".parquet",  # ALL-DIGIT uuid4 hex: rare but must be found
    ]
    for n in names:
        (log / n).write_bytes(b"")
    got = [os.path.basename(p)
           for p in _v2_checkpoint_candidates(str(tmp_path / "t"), 5)]
    assert got == [
        f"{5:020d}.checkpoint.00c0ffee00c0ffee.json",
        f"{5:020d}.checkpoint.00c0ffee00c0ffee.parquet",
        f"{5:020d}.checkpoint.12345678901234567890123456789012"
        ".parquet"]
