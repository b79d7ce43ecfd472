"""ext/delta_log.py: the public Delta Lake transaction-log protocol on
plain parquet + JSON — replay, time travel, checkpoints, OCC.

Golden strategy: beside writer/reader roundtrips, a THIRD-PARTY-shaped
log is hand-written JSON-line by JSON-line (independent of write_delta)
and must replay correctly — pinning the reader against the protocol,
not against our writer."""

from __future__ import annotations

import json

import pytest

import tulflow_spark.fsio as fsio
from tulflow_spark.ext.delta_log import (
    DeltaConcurrentCommit,
    DeltaProtocolError,
    latest_version,
    read_delta,
    write_checkpoint,
    write_delta,
)


def _df(spark, lo, hi, tag="x"):
    return spark.createDataFrame(
        [(i, f"{tag}{i}") for i in range(lo, hi)], "id long, v string"
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_roundtrip_append_overwrite_timetravel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert write_delta(_df(spark, 0, 10), t) == 0
    assert write_delta(_df(spark, 10, 15), t, mode="append") == 1
    assert write_delta(_df(spark, 99, 100), t, mode="overwrite") == 2
    assert latest_version(t) == 2
    assert _ids(read_delta(spark, t)) == [99]
    assert _ids(read_delta(spark, t, version=0)) == list(range(10))
    assert _ids(read_delta(spark, t, version=1)) == list(range(15))


def test_mode_error_on_existing_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)
    with pytest.raises(DeltaProtocolError, match="already exists"):
        write_delta(_df(spark, 0, 3), t)


def test_occ_stale_base_and_cas(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)
    write_delta(_df(spark, 3, 6), t, mode="append")  # v1
    with pytest.raises(DeltaConcurrentCommit, match="at version 1"):
        write_delta(_df(spark, 9, 10), t, mode="append", expect_version=0)
    # same-instant race: pin the loser's view of latest at 0 so only the
    # version-file CAS stands between it and a lost update
    from unittest import mock

    import tulflow_spark.ext.delta_log as dl

    with mock.patch.object(dl, "latest_version", return_value=0):
        with pytest.raises(DeltaConcurrentCommit, match="another writer"):
            write_delta(_df(spark, 9, 10), t, mode="append")
    # table state is exactly the first two commits
    assert _ids(read_delta(spark, t)) == list(range(6))


def test_third_party_log_replays(spark, tmp_path):
    """A log written BY HAND in the protocol's JSON shape (as another
    Delta implementation would emit it) must replay: protocol + metaData
    + adds in v0, a remove + add in v1."""
    t = str(tmp_path / "tbl")
    _df(spark, 0, 4).coalesce(1).write.parquet(f"{t}/d0")
    _df(spark, 4, 8).coalesce(1).write.parquet(f"{t}/d1")
    f0 = [n for n in fsio.list_names(f"{t}/d0") if n.endswith(".parquet")][0]
    f1 = [n for n in fsio.list_names(f"{t}/d1") if n.endswith(".parquet")][0]
    schema = _df(spark, 0, 1).schema.json()
    v0 = "\n".join([
        json.dumps({"protocol": {"minReaderVersion": 1,
                                 "minWriterVersion": 2}}),
        json.dumps({"metaData": {"id": "abc", "format":
                    {"provider": "parquet", "options": {}},
                    "schemaString": schema, "partitionColumns": [],
                    "configuration": {}}}),
        json.dumps({"add": {"path": f"d0/{f0}", "partitionValues": {},
                    "size": 1, "modificationTime": 0,
                    "dataChange": True}}),
        # third-party logs carry commitInfo lines; readers must skip them
        json.dumps({"commitInfo": {"operation": "WRITE"}}),
    ])
    v1 = "\n".join([
        json.dumps({"remove": {"path": f"d0/{f0}", "dataChange": True,
                    "deletionTimestamp": 1}}),
        json.dumps({"add": {"path": f"d1/{f1}", "partitionValues": {},
                    "size": 1, "modificationTime": 0,
                    "dataChange": True}}),
    ])
    fsio.write_text(f"{t}/_delta_log/00000000000000000000.json", v0)
    fsio.write_text(f"{t}/_delta_log/00000000000000000001.json", v1)
    assert _ids(read_delta(spark, t, version=0)) == [0, 1, 2, 3]
    assert _ids(read_delta(spark, t)) == [4, 5, 6, 7]


def test_checkpoint_covers_cleaned_log(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 5), t)
    write_delta(_df(spark, 5, 8), t, mode="append")
    write_delta(_df(spark, 8, 9), t, mode="append")
    assert write_checkpoint(spark, t) == 2
    # age out every checkpointed JSON commit (Delta's log cleanup)
    for v in (0, 1, 2):
        fsio.delete(f"{t}/_delta_log/{v:020d}.json")
    assert _ids(read_delta(spark, t)) == list(range(9))
    # the log keeps working past the checkpoint
    write_delta(_df(spark, 9, 11), t, mode="append")
    assert _ids(read_delta(spark, t)) == list(range(11))
    # but time travel BELOW the cleaned commits fails typed
    with pytest.raises(DeltaProtocolError, match="gaps"):
        read_delta(spark, t, version=1)


def test_empty_snapshot_keeps_schema(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)
    write_delta(_df(spark, 0, 0), t, mode="overwrite")  # empty table
    out = read_delta(spark, t)
    assert out.count() == 0
    assert out.columns == ["id", "v"]
    # previous version still readable
    assert _ids(read_delta(spark, t, version=0)) == [0, 1, 2]


def test_typed_errors(spark, tmp_path):
    t = str(tmp_path / "none")
    with pytest.raises(DeltaProtocolError, match="no delta log"):
        read_delta(spark, t)
    t2 = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 2), t2)
    with pytest.raises(DeltaProtocolError, match="out of range"):
        read_delta(spark, t2, version=7)
    # malformed action line
    fsio.write_text(f"{t2}/_delta_log/00000000000000000001.json",
                    "{not json")
    with pytest.raises(DeltaProtocolError, match="malformed action"):
        read_delta(spark, t2)
    # reader-version wall
    fsio.write_text(
        f"{t2}/_delta_log/00000000000000000001.json",
        json.dumps({"protocol": {"minReaderVersion": 3,
                                 "minWriterVersion": 7}}),
    )
    with pytest.raises(DeltaProtocolError, match="reader version 3"):
        read_delta(spark, t2)


def test_losers_staged_files_unreferenced(spark, tmp_path):
    """A losing commit leaves only staged files no snapshot references —
    the table's live content is unaffected at every version."""
    from unittest import mock

    import tulflow_spark.ext.delta_log as dl

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)
    with mock.patch.object(dl, "latest_version", return_value=-1):
        with pytest.raises(DeltaConcurrentCommit):
            write_delta(_df(spark, 50, 60), t, mode="append",
                        expect_version=-1)
    assert _ids(read_delta(spark, t)) == [0, 1, 2]


def test_append_schema_enforced(spark, tmp_path):
    """r8 review: schema-divergent appends must be rejected (the
    protocol's writer duty) — silent column drift under a sampled
    parquet footer was the failure mode."""
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)
    bad = spark.createDataFrame([(1, "a", 9)], "id long, v string, extra long")
    with pytest.raises(DeltaProtocolError, match="schema mismatch"):
        write_delta(bad, t, mode="append")
    # overwrite MAY change the schema — recorded in a fresh metaData
    write_delta(bad, t, mode="overwrite")
    out = read_delta(spark, t)
    assert out.columns == ["id", "v", "extra"]
    # and the old version still reads with the OLD schema
    assert read_delta(spark, t, version=0).columns == ["id", "v"]


def test_structurally_malformed_actions_typed(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 2), t)
    for payload in (
        json.dumps({"add": {}}),          # missing add.path
        "5",                               # valid JSON, not an action
        json.dumps({"remove": None}),      # null action body
    ):
        fsio.write_text(f"{t}/_delta_log/00000000000000000001.json", payload)
        with pytest.raises(DeltaProtocolError, match="malformed action"):
            read_delta(spark, t)
        fsio.delete(f"{t}/_delta_log/00000000000000000001.json")
    fsio.write_text(f"{t}/_delta_log/_last_checkpoint",
                    json.dumps({"version": None}))
    with pytest.raises(DeltaProtocolError, match="_last_checkpoint"):
        read_delta(spark, t)


def test_writer_duties_on_third_party_tables(spark, tmp_path):
    """minWriterVersion wall + delta.appendOnly honored on write."""
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 2), t)
    schema = _df(spark, 0, 1).schema.json()
    fsio.write_text(
        f"{t}/_delta_log/00000000000000000001.json",
        json.dumps({"protocol": {"minReaderVersion": 1,
                                 "minWriterVersion": 7}}),
    )
    with pytest.raises(DeltaProtocolError, match="writer version 7"):
        write_delta(_df(spark, 5, 6), t, mode="append")
    fsio.write_text(
        f"{t}/_delta_log/00000000000000000001.json",
        json.dumps({"metaData": {"id": "x", "schemaString": schema,
                    "partitionColumns": [],
                    "configuration": {"delta.appendOnly": "true"}}}),
    )
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        write_delta(_df(spark, 5, 6), t, mode="overwrite")
    write_delta(_df(spark, 5, 6), t, mode="append")  # appends still fine
    assert _ids(read_delta(spark, t)) == [0, 1, 5]


def test_url_encoded_add_paths(spark, tmp_path):
    """add.path is URL-encoded per PROTOCOL.md: a third-party log
    referencing 'part 0.parquet' stores 'part%200.parquet'."""
    t = str(tmp_path / "tbl")
    _df(spark, 0, 3).coalesce(1).write.parquet(f"{t}/stage")
    f = [n for n in fsio.list_names(f"{t}/stage") if n.endswith(".parquet")][0]
    import shutil

    shutil.move(f"{t}/stage/{f}", f"{t}/stage/part 0.parquet")
    schema = _df(spark, 0, 1).schema.json()
    fsio.write_text(
        f"{t}/_delta_log/00000000000000000000.json",
        "\n".join([
            json.dumps({"protocol": {"minReaderVersion": 1,
                                     "minWriterVersion": 2}}),
            json.dumps({"metaData": {"id": "x", "format":
                        {"provider": "parquet", "options": {}},
                        "schemaString": schema, "partitionColumns": [],
                        "configuration": {}}}),
            json.dumps({"add": {"path": "stage/part%200.parquet",
                        "partitionValues": {}, "size": 1,
                        "modificationTime": 0, "dataChange": True}}),
        ]),
    )
    assert _ids(read_delta(spark, t)) == [0, 1, 2]


def test_multipart_checkpoint(spark, tmp_path):
    """_last_checkpoint with parts=N names the protocol's multi-part
    layout; the reader must assemble all parts."""
    import pyarrow.parquet as pq

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 4), t)
    write_delta(_df(spark, 4, 8), t, mode="append")
    # build a 2-part checkpoint by splitting our single-file one
    write_checkpoint(spark, t)
    single = f"{t}/_delta_log/{1:020d}.checkpoint.parquet"
    tbl = pq.read_table(single)
    part1 = tbl.slice(0, 2)
    part2 = tbl.slice(2)
    pq.write_table(
        part1, f"{t}/_delta_log/{1:020d}.checkpoint.0000000001.0000000002.parquet")
    pq.write_table(
        part2, f"{t}/_delta_log/{1:020d}.checkpoint.0000000002.0000000002.parquet")
    fsio.delete(single)
    fsio.write_text(f"{t}/_delta_log/_last_checkpoint",
                    json.dumps({"version": 1, "size": tbl.num_rows,
                                "parts": 2}))
    for v in (0, 1):
        fsio.delete(f"{t}/_delta_log/{v:020d}.json")
    assert _ids(read_delta(spark, t)) == list(range(8))


def test_missing_checkpoint_falls_back_to_json(spark, tmp_path):
    """_last_checkpoint pointing at a deleted parquet must fall back to
    full JSON replay when the commits survive (not an anonymous Spark
    error)."""
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)
    write_delta(_df(spark, 3, 5), t, mode="append")
    write_checkpoint(spark, t)
    fsio.delete(f"{t}/_delta_log/{1:020d}.checkpoint.parquet")
    assert _ids(read_delta(spark, t)) == list(range(5))


def test_partitioned_write_read_roundtrip(spark, tmp_path):
    """Hive-partitioned tables: partition values live in the LOG
    (add.partitionValues), not the data files — the reader must inject
    them as typed columns (a verbatim scan returns silent NULLs)."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 3, f"x{i}") for i in range(12)],
        "id long, bucket int, v string",
    )
    write_delta(df, t, partition_by=["bucket"])
    out = read_delta(spark, t)
    assert sorted(out.columns) == ["bucket", "id", "v"]
    got = {(r["id"], r["bucket"]) for r in out.collect()}
    assert got == {(i, i % 3) for i in range(12)}
    # append must keep the partitioning
    df2 = spark.createDataFrame([(99, 1, "y")],
                                "id long, bucket int, v string")
    with pytest.raises(DeltaProtocolError, match="partitioning mismatch"):
        write_delta(df2, t, mode="append")
    write_delta(df2, t, mode="append", partition_by=["bucket"])
    assert _ids(read_delta(spark, t)) == list(range(12)) + [99]
    # checkpoint carries partitionColumns; cleaned log still partitioned
    write_checkpoint(spark, t)
    for v in (0, 1):
        fsio.delete(f"{t}/_delta_log/{v:020d}.json")
    out2 = read_delta(spark, t)
    assert {(r["id"], r["bucket"]) for r in out2.collect()} == \
        got | {(99, 1)}


def test_partition_null_and_special_values(spark, tmp_path):
    """NULL partition values (__HIVE_DEFAULT_PARTITION__ dirs) and
    values Spark hive-escapes round-trip through the log."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a b", "x"), (2, None, "y"), (3, "c:d", "z")],
        "id long, part string, v string",
    )
    write_delta(df, t, partition_by=["part"])
    rows = {r["id"]: r["part"] for r in read_delta(spark, t).collect()}
    assert rows == {1: "a b", 2: None, 3: "c:d"}


def test_empty_string_partition_value_refused(spark, tmp_path):
    """r8 review: hive layout maps '' and NULL to the same dir — logging
    null for '' would silently corrupt the table, so the writer refuses
    typed."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "", "x")],
                               "id long, part string, v string")
    with pytest.raises(DeltaProtocolError, match="empty-string partition"):
        write_delta(df, t, partition_by=["part"])


def test_malformed_partition_state_typed(spark, tmp_path):
    """Missing partitionValues keys and unparseable values are protocol
    errors, not silent NULLs."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 2, "x")],
                               "id long, bucket int, v string")
    write_delta(df, t, partition_by=["bucket"])
    # rewrite v0 with a corrupted add: value not parseable as int
    log = f"{t}/_delta_log/00000000000000000000.json"
    fs, lp = fsio.resolve(log)
    with fs.open_input_stream(lp) as stream:
        lines = stream.read().decode().splitlines()
    bad = [json.loads(x) for x in lines]
    for a in bad:
        if "add" in a:
            a["add"]["partitionValues"] = {"bucket": "abc"}
    fsio.delete(log)
    fsio.write_text(log, "\n".join(json.dumps(a) for a in bad))
    with pytest.raises(DeltaProtocolError, match="does not parse as int"):
        read_delta(spark, t).collect()
    for a in bad:
        if "add" in a:
            a["add"]["partitionValues"] = {}
    fsio.delete(log)
    fsio.write_text(log, "\n".join(json.dumps(a) for a in bad))
    with pytest.raises(DeltaProtocolError, match="missing partitionValues"):
        read_delta(spark, t).collect()


def test_delete_where_copy_on_write(spark, tmp_path):
    """Delta DELETE: only files containing matches are tombstoned and
    rewritten; untouched files carry over BY REFERENCE (asserted on the
    surviving add path); time travel to the pre-delete version is
    intact."""
    from tulflow_spark.ext.delta_log import _replay, delete_where

    t = str(tmp_path / "tbl")
    # two files with disjoint id ranges via two commits
    write_delta(_df(spark, 0, 10).coalesce(1), t)
    write_delta(_df(spark, 10, 20).coalesce(1), t, mode="append")
    before = set(_replay(spark, t, None).live)
    untouched = {p for p in before
                 if 19 in _ids(spark.read.parquet(f"{t}/{p}"))}
    assert len(untouched) == 1
    v = delete_where(spark, t, "id < 5")
    assert v == 2
    after = _replay(spark, t, None).live
    # the file with ids 10..19 contains no matches: its ORIGINAL add
    # carries over untouched; the matched file was tombstoned+rewritten
    assert untouched <= set(after)
    assert not (before - untouched) & set(after)
    assert _ids(read_delta(spark, t)) == list(range(5, 20))
    assert _ids(read_delta(spark, t, version=1)) == list(range(20))
    # NULL-predicate rows are KEPT (DELETE removes only condition=true)
    t2 = str(tmp_path / "nulls")
    df = spark.createDataFrame([(1, "x"), (2, None), (3, "x")],
                               "id long, v string")
    write_delta(df.coalesce(1), t2)
    delete_where(spark, t2, "v = 'x'")
    assert _ids(read_delta(spark, t2)) == [2]
    # no matches: no-op, version unchanged
    assert delete_where(spark, t, "id > 1000") == 2
    # delete everything: empty snapshot keeps the schema
    assert delete_where(spark, t, "id >= 0") == 3
    out = read_delta(spark, t)
    assert out.count() == 0 and out.columns == ["id", "v"]


def test_delete_where_walls(spark, tmp_path):
    from tulflow_spark.ext.delta_log import delete_where

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 2, "x"), (2, 3, "y")],
                               "id long, bucket int, v string")
    write_delta(df, t, partition_by=["bucket"])
    # partitioned tables delete since r12 (was a typed wall)
    delete_where(spark, t, "id = 1")
    assert [(r["id"], r["bucket"]) for r in
            read_delta(spark, t).collect()] == [(2, 3)]
    with pytest.raises(DeltaProtocolError, match="no delta table"):
        delete_where(spark, str(tmp_path / "none"), "id = 1")


def test_txn_watermark_and_stream_sink_idempotence(spark, tmp_path):
    """The protocol txn action: replayed micro-batches are skipped, and
    the watermark survives checkpoint + log cleanup."""
    from tulflow_spark.ext.delta_log import (
        delta_stream_sink,
        last_txn_version,
    )

    t = str(tmp_path / "tbl")
    sink = delta_stream_sink(t, "app-1")
    sink(_df(spark, 0, 5), 0)
    sink(_df(spark, 5, 8), 1)
    assert last_txn_version(spark, t, "app-1") == 1
    assert last_txn_version(spark, t, "other") == -1
    # restart replays batch 1: must be a no-op
    sink(_df(spark, 5, 8), 1)
    assert _ids(read_delta(spark, t)) == list(range(8))
    assert latest_version(t) == 1
    # a second app interleaves with its own watermark
    sink2 = delta_stream_sink(t, "app-2")
    sink2(_df(spark, 100, 101), 0)
    assert last_txn_version(spark, t, "app-1") == 1
    assert last_txn_version(spark, t, "app-2") == 0
    # watermarks survive checkpoint + JSON cleanup
    write_checkpoint(spark, t)
    for v in (0, 1, 2):
        fsio.delete(f"{t}/_delta_log/{v:020d}.json")
    assert last_txn_version(spark, t, "app-1") == 1
    sink(_df(spark, 5, 8), 1)  # still skipped post-cleanup
    assert latest_version(t) == 2
    sink(_df(spark, 8, 10), 2)  # next batch appends normally
    assert _ids(read_delta(spark, t)) == list(range(10)) + [100]


def test_structured_stream_into_delta(spark, tmp_path):
    """Full writeStream.foreachBatch path: a file stream drains into a
    Delta table one file per trigger; every row lands exactly once and
    the txn watermark tracks the last batch."""
    from tulflow_spark.ext.delta_log import (
        delta_stream_sink,
        last_txn_version,
    )

    src = str(tmp_path / "src")
    t = str(tmp_path / "tbl")
    _df(spark, 0, 4).coalesce(1).write.parquet(f"{src}/b0")
    _df(spark, 4, 9).coalesce(1).write.parquet(f"{src}/b1")
    stream = (
        spark.readStream.schema("id long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.foreachBatch(delta_stream_sink(t, "stream-app"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _ids(read_delta(spark, t)) == list(range(9))
    assert last_txn_version(spark, t, "stream-app") >= 0


def test_checkpoint_preserves_appendonly_configuration(spark, tmp_path):
    """r8 ADVICE (high): a snapshot resumed from a checkpoint must keep
    metaData.configuration — delta.appendOnly enforcement survived a
    full JSON replay but lapsed after write_checkpoint."""
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 2), t)
    schema = _df(spark, 0, 1).schema.json()
    fsio.write_text(
        f"{t}/_delta_log/00000000000000000001.json",
        json.dumps({"metaData": {"id": "tbl-ao", "schemaString": schema,
                    "partitionColumns": [],
                    "configuration": {"delta.appendOnly": "true"}}}),
    )
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        write_delta(_df(spark, 5, 6), t, mode="overwrite")
    write_checkpoint(spark, t)
    for v in (0, 1):
        fsio.delete(f"{t}/_delta_log/{v:020d}.json")
    # the wall must still hold when the snapshot replays from the
    # checkpoint alone (this exact sequence was accepted pre-fix)
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        write_delta(_df(spark, 5, 6), t, mode="overwrite")
    from tulflow_spark.ext.delta_log import delete_where

    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        delete_where(spark, t, "id = 0")
    write_delta(_df(spark, 5, 6), t, mode="append")  # appends still fine
    assert _ids(read_delta(spark, t)) == [0, 1, 5]


def test_checkpoint_preserves_writer_version_and_id(spark, tmp_path):
    """r8 ADVICE (medium): write_checkpoint must persist the table's
    RECORDED protocol and metaData id, not hardcode writer version 2."""
    from tulflow_spark.ext.delta_log import _replay

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 2), t)
    orig_id = _replay(spark, t, None).meta_id
    assert orig_id  # write path records a metaData id
    fsio.write_text(
        f"{t}/_delta_log/00000000000000000001.json",
        json.dumps({"protocol": {"minReaderVersion": 1,
                                 "minWriterVersion": 7}}),
    )
    write_checkpoint(spark, t)
    for v in (0, 1):
        fsio.delete(f"{t}/_delta_log/{v:020d}.json")
    snap = _replay(spark, t, None)
    assert snap.min_writer == 7
    assert snap.meta_id == orig_id  # identity stable across checkpoint
    with pytest.raises(DeltaProtocolError, match="writer version 7"):
        write_delta(_df(spark, 5, 6), t, mode="append")


def test_stream_sink_zombie_twin_exactly_once(spark, tmp_path, monkeypatch):
    """r8 ADVICE (medium): a concurrent same-app writer committing the
    same batch between the sink's watermark check and its CAS must NOT
    append the batch twice — expect_version forces the conflict."""
    import tulflow_spark.ext.delta_log as dl

    t = str(tmp_path / "tbl")
    dl.write_delta(_df(spark, 0, 3), t)
    real = dl._validate_write
    fired = {"n": 0}

    def racy(df, path, mode, expect_version, partition_by):
        out = real(df, path, mode, expect_version, partition_by)
        if fired["n"] == 0:
            fired["n"] += 1
            # the zombie twin lands the SAME (app, batch) between the
            # sink's snapshot read and its publish
            dl.write_delta(_df(spark, 10, 13), path, mode="append",
                           txn=("app-z", 0))
        return out

    monkeypatch.setattr(dl, "_validate_write", racy)
    sink = dl.delta_stream_sink(t, "app-z")
    sink(_df(spark, 10, 13), 0)
    assert _ids(read_delta(spark, t)) == [0, 1, 2, 10, 11, 12]
    assert dl.last_txn_version(spark, t, "app-z") == 0


def test_add_stats_recorded_and_checkpoint_preserved(spark, tmp_path):
    """write_delta records footer-derived add.stats; checkpoints carry
    them (the protocol's data-skipping index survives log cleanup)."""
    from tulflow_spark.ext.delta_log import _replay

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 10, 20), t)
    snap = _replay(spark, t, None)
    stats = [json.loads(a["stats"]) for a in snap.live.values()]
    assert sum(s["numRecords"] for s in stats) == 10
    assert min(s["minValues"]["id"] for s in stats) == 10
    assert max(s["maxValues"]["id"] for s in stats) == 19
    assert all(s["nullCount"]["id"] == 0 for s in stats)
    write_checkpoint(spark, t)
    fsio.delete(f"{t}/_delta_log/{0:020d}.json")
    snap2 = _replay(spark, t, None)
    assert all(a.get("stats") for a in snap2.live.values())


def test_prune_skips_files_by_stats(spark, tmp_path):
    """read_delta(prune=...) opens only files whose stats admit the
    range; the surviving superset still filters to the exact answer."""
    t = str(tmp_path / "tbl")
    # one file per commit, disjoint id ranges
    for lo in range(0, 50, 10):
        write_delta(_df(spark, lo, lo + 10).coalesce(1), t,
                    mode="append" if lo else "error")
    pruned = read_delta(spark, t, prune=("id", 23, 41))
    files = pruned.inputFiles()
    assert len(files) == 3  # ranges 20-29, 30-39, 40-49
    assert _ids(pruned.where("id BETWEEN 23 AND 41")) == list(range(23, 42))
    # full read still sees everything
    assert len(read_delta(spark, t).inputFiles()) == 5
    # a range nothing matches: zero files, empty frame, schema kept
    none = read_delta(spark, t, prune=("id", 1000, 2000))
    assert none.count() == 0 and none.columns == ["id", "v"]


def test_prune_by_partition_values(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 40).withColumn("bucket", (F.col("id") % 4).cast("int"))
    write_delta(df, t, partition_by=["bucket"])
    pruned = read_delta(spark, t, prune=("bucket", 1, 2))
    got = sorted(r["bucket"] for r in pruned.select("bucket").distinct().collect())
    assert got == [1, 2]
    # NULL partition values are provably outside any range
    df_null = df.withColumn(
        "bucket", F.when(F.col("id") < 20, F.col("bucket")))
    write_delta(df_null, t, mode="overwrite", partition_by=["bucket"])
    pruned2 = read_delta(spark, t, prune=("bucket", 0, 9))
    assert pruned2.where("bucket IS NULL").count() == 0
    assert read_delta(spark, t).where("bucket IS NULL").count() == 20


def test_optimize_compacts_and_preserves_content(spark, tmp_path):
    from tulflow_spark.ext.delta_log import _replay, optimize_delta

    t = str(tmp_path / "tbl")
    for lo in range(0, 40, 10):
        write_delta(_df(spark, lo, lo + 10).repartition(3), t,
                    mode="append" if lo else "error")
    before = _replay(spark, t, None)
    assert len(before.live) >= 8
    v = optimize_delta(spark, t)
    assert v == 4
    after = _replay(spark, t, None)
    assert len(after.live) == 1  # bin-packed into one file
    assert _ids(read_delta(spark, t)) == list(range(40))
    # layout-only commit: every action is dataChange=false
    fs, lp = fsio.resolve(f"{t}/_delta_log/{v:020d}.json")
    with fs.open_input_stream(lp) as s:
        acts = [json.loads(x) for x in s.read().decode().splitlines() if x]
    assert all(
        not (a.get("add") or a.get("remove"))["dataChange"] for a in acts
    )
    # pre-optimize versions still time travel
    assert _ids(read_delta(spark, t, version=0)) == list(range(10))
    # nothing further to do
    assert optimize_delta(spark, t) is None


def test_optimize_partitioned_and_appendonly(spark, tmp_path):
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import _replay, optimize_delta

    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 30).withColumn("b", (F.col("id") % 2).cast("int"))
    write_delta(df.repartition(4), t, partition_by=["b"])
    schema = df.schema.json()
    fsio.write_text(
        f"{t}/_delta_log/00000000000000000001.json",
        json.dumps({"metaData": {"id": "x", "schemaString": schema,
                    "partitionColumns": ["b"],
                    "configuration": {"delta.appendOnly": "true"}}}),
    )
    v = optimize_delta(spark, t)  # legal on appendOnly: no rows change
    assert v == 2
    snap = _replay(spark, t, None)
    assert len(snap.live) == 2  # one file per partition
    out = read_delta(spark, t)
    assert _ids(out) == list(range(30))
    assert out.where("b = id % 2").count() == 30  # partition values kept


def test_optimize_conflicts_with_concurrent_commit(spark, tmp_path,
                                                   monkeypatch):
    import tulflow_spark.ext.delta_log as dl

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 10).repartition(2), t)
    real_stage = dl._stage_adds

    def stage_then_race(df, path, partition_by, data_change=True):
        adds = real_stage(df, path, partition_by, data_change)
        monkeypatch.setattr(dl, "_stage_adds", real_stage)
        dl.write_delta(_df(spark, 50, 51), t, mode="append")
        return adds

    monkeypatch.setattr(dl, "_stage_adds", stage_then_race)
    with pytest.raises(DeltaConcurrentCommit):
        dl.optimize_delta(spark, t)
    assert _ids(read_delta(spark, t)) == list(range(10)) + [50]


def test_vacuum_deletes_unreferenced_only(spark, tmp_path):
    from tulflow_spark.ext.delta_log import optimize_delta, vacuum_delta

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 10).repartition(2), t)
    write_delta(_df(spark, 99, 100), t, mode="overwrite")
    optimize_delta(spark, t, min_files=1)
    # an orphan from a losing racer
    _df(spark, 0, 1).write.parquet(f"{t}/commit-deadbeef0000")
    deleted = vacuum_delta(spark, t, min_age_seconds=0)
    assert len(deleted) >= 3  # v0 files + pre-optimize v1 file + orphan
    assert any("deadbeef" in d for d in deleted)
    assert _ids(read_delta(spark, t)) == [99]  # live snapshot intact
    with pytest.raises(Exception):
        read_delta(spark, t, version=0).collect()  # horizon gone
    # keep_versions widens the window: nothing more to delete
    assert vacuum_delta(spark, t, keep_versions=5, min_age_seconds=0) == []


def test_vacuum_keep_versions_preserves_travel(spark, tmp_path):
    from tulflow_spark.ext.delta_log import vacuum_delta

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 5), t)
    write_delta(_df(spark, 5, 8), t, mode="overwrite")
    deleted = vacuum_delta(spark, t, keep_versions=1, min_age_seconds=0)
    # markers may go, but no DATA file referenced by the kept window
    assert not any(d.endswith(".parquet") for d in deleted)
    assert _ids(read_delta(spark, t, version=0)) == list(range(5))


def test_write_with_retry_wins_after_races(spark, tmp_path, monkeypatch):
    """Stages once, revalidates per attempt, lands after the racers."""
    import tulflow_spark.ext.delta_log as dl

    t = str(tmp_path / "tbl")
    dl.write_delta(_df(spark, 0, 3), t)
    real_validate = dl._validate_write
    races = {"n": 0}

    def contended(df, path, mode, expect_version, partition_by):
        out = real_validate(df, path, mode, expect_version, partition_by)
        if races["n"] < 3:
            races["n"] += 1
            # another writer lands between validate and publish
            dl._publish(path, out[0], [])
        return out

    monkeypatch.setattr(dl, "_validate_write", contended)
    stage_calls = {"n": 0}
    real_stage = dl._stage_adds

    def counting_stage(*a, **kw):
        stage_calls["n"] += 1
        return real_stage(*a, **kw)

    monkeypatch.setattr(dl, "_stage_adds", counting_stage)
    v = dl.write_delta_with_retry(_df(spark, 3, 6), t, mode="append")
    assert v == 4 and races["n"] == 3
    assert stage_calls["n"] == 1  # data staged exactly once
    assert _ids(read_delta(spark, t)) == list(range(6))


def test_write_with_retry_exhausts_typed(spark, tmp_path, monkeypatch):
    import tulflow_spark.ext.delta_log as dl

    t = str(tmp_path / "tbl")
    dl.write_delta(_df(spark, 0, 3), t)
    real_validate = dl._validate_write

    def always_raced(df, path, mode, expect_version, partition_by):
        out = real_validate(df, path, mode, expect_version, partition_by)
        dl._publish(path, out[0], [])
        return out

    monkeypatch.setattr(dl, "_validate_write", always_raced)
    with pytest.raises(DeltaConcurrentCommit, match="lost the commit race"):
        dl.write_delta_with_retry(_df(spark, 3, 6), t, mode="append",
                                  max_attempts=3)
    with pytest.raises(ValueError, match="error"):
        dl.write_delta_with_retry(_df(spark, 0, 1), t, mode="error")


def test_read_delta_changes_incremental(spark, tmp_path):
    from tulflow_spark.ext.delta_log import (
        optimize_delta,
        read_delta_changes,
    )

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 5).repartition(2), t)                 # v0
    write_delta(_df(spark, 5, 8).repartition(2), t, mode="append")  # v1
    optimize_delta(spark, t)                                        # v2
    write_delta(_df(spark, 8, 10), t, mode="append")                # v3
    assert _ids(read_delta_changes(spark, t, -1)) == list(range(10))
    assert _ids(read_delta_changes(spark, t, 0)) == list(range(5, 10))
    # OPTIMIZE is invisible to incremental consumers
    assert _ids(read_delta_changes(spark, t, 1)) == [8, 9]
    assert read_delta_changes(spark, t, 1, to_version=2).count() == 0
    assert read_delta_changes(spark, t, 3).count() == 0  # empty range
    # schema survives an empty change set
    assert read_delta_changes(spark, t, 3).columns == ["id", "v"]


def test_read_delta_changes_walls(spark, tmp_path):
    from tulflow_spark.ext.delta_log import read_delta_changes

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 5), t)
    write_delta(_df(spark, 9, 10), t, mode="overwrite")
    with pytest.raises(DeltaProtocolError, match="not append-only"):
        read_delta_changes(spark, t, 0)
    with pytest.raises(DeltaProtocolError, match="out of bounds"):
        read_delta_changes(spark, t, 5)
    # aged-out commits below a checkpoint raise typed
    write_delta(_df(spark, 10, 12), t, mode="append")
    write_checkpoint(spark, t)
    for v in (0, 1, 2):
        fsio.delete(f"{t}/_delta_log/{v:020d}.json")
    with pytest.raises(DeltaProtocolError, match="aged out"):
        read_delta_changes(spark, t, 0)


def test_read_delta_changes_partitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import read_delta_changes

    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 10).withColumn("b", (F.col("id") % 2).cast("int"))
    write_delta(df, t, partition_by=["b"])
    df2 = _df(spark, 10, 14).withColumn("b", (F.col("id") % 2).cast("int"))
    write_delta(df2, t, mode="append", partition_by=["b"])
    out = read_delta_changes(spark, t, 0)
    assert _ids(out) == [10, 11, 12, 13]
    assert out.where("b = id % 2").count() == 4


def test_vacuum_keeps_fresh_inflight_staged_files(spark, tmp_path):
    """Review r9: a concurrent writer's staged-but-uncommitted files are
    referenced by no snapshot; the min-age guard must keep them."""
    from tulflow_spark.ext.delta_log import vacuum_delta

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)
    # simulate an in-flight writer mid-stage (published nothing yet)
    _df(spark, 9, 10).write.parquet(f"{t}/commit-inflight0001")
    assert vacuum_delta(spark, t) == []  # default 1h guard keeps it
    assert fsio.exists(f"{t}/commit-inflight0001")
    deleted = vacuum_delta(spark, t, min_age_seconds=0)
    assert any("inflight" in d for d in deleted)


def test_prune_unknown_partition_type_keeps_file(spark, tmp_path):
    """Review r9: a third-party log with partitionColumns but no schema
    must keep (not KeyError) under prune — skipping is never a filter."""
    from tulflow_spark.ext.delta_log import _file_pruned

    add = {"partitionValues": {"day": "2024-01-01"}}
    assert _file_pruned(add, "day", "2024-02-01", "2024-03-01",
                        ["day"], {}) is False


def test_stats_nullcount_poisoned_not_understated(spark, tmp_path):
    """Review r9: a row group without null_count must drop the column
    from nullCount entirely, not publish a partial total as exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tulflow_spark.ext.delta_log import _file_stats

    p = str(tmp_path / "two_groups.parquet")
    w = pq.ParquetWriter(
        p, pa.schema([("id", pa.int64())]), write_statistics=False
    )
    w.write_table(pa.table({"id": [1, None, 3]}))
    w.close()
    import tulflow_spark.fsio as fsio_mod

    fs, base = fsio_mod.resolve(p)
    stats = __import__("json").loads(_file_stats(fs, base))
    assert stats["numRecords"] == 3
    assert "id" not in stats["nullCount"]
    assert "id" not in stats["minValues"]


def test_stream_sink_stages_batch_once_under_contention(
    spark, tmp_path, monkeypatch
):
    """Review r9: OCC retries in the sink must not re-stage the batch."""
    import tulflow_spark.ext.delta_log as dl

    t = str(tmp_path / "tbl")
    dl.write_delta(_df(spark, 0, 3), t)
    real_validate = dl._validate_write
    races = {"n": 0}

    def contended(df, path, mode, expect_version, partition_by):
        out = real_validate(df, path, mode, expect_version, partition_by)
        if races["n"] < 2:
            races["n"] += 1
            dl._publish(path, out[0], [])  # other-app writer wins
        return out

    monkeypatch.setattr(dl, "_validate_write", contended)
    stage_calls = {"n": 0}
    real_stage = dl._stage_adds

    def counting_stage(*a, **kw):
        stage_calls["n"] += 1
        return real_stage(*a, **kw)

    monkeypatch.setattr(dl, "_stage_adds", counting_stage)
    dl.delta_stream_sink(t, "app-s")(_df(spark, 3, 5), 0)
    assert stage_calls["n"] == 1
    assert _ids(read_delta(spark, t)) == list(range(5))


def test_optimize_converges_and_skips_at_target_files(spark, tmp_path):
    """Review r9: OPTIMIZE must reach a fixed point — files at/over the
    target size are never rewritten, and a pack that cannot reduce the
    group's file count is skipped."""
    from tulflow_spark.ext.delta_log import optimize_delta

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 10).repartition(2), t)
    # every live file is "at target" for a tiny target: nothing to do
    assert optimize_delta(spark, t, target_file_bytes=1) is None
    # normal target compacts once, then converges
    assert optimize_delta(spark, t) == 1
    assert optimize_delta(spark, t) is None
    assert _ids(read_delta(spark, t)) == list(range(10))


def test_stats_decimal_columns_omitted_not_crash(spark, tmp_path):
    """Review r9 (high): decimal stats come back as decimal.Decimal from
    the parquet footer — writes must succeed with the column omitted
    from min/max, never a JSON TypeError."""
    from decimal import Decimal

    from tulflow_spark.ext.delta_log import _replay

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, Decimal("10.50")), (2, Decimal("99.99"))],
        "id long, price decimal(10,2)",
    )
    write_delta(df.coalesce(1), t)
    snap = _replay(spark, t, None)
    stats = [json.loads(a["stats"]) for a in snap.live.values()]
    assert sum(s["numRecords"] for s in stats) == 2
    st = next(s for s in stats if s["numRecords"])
    assert "price" not in st["minValues"] and "id" in st["minValues"]
    got = read_delta(spark, t).collect()
    assert sorted(r["price"] for r in got) == [Decimal("10.50"),
                                               Decimal("99.99")]


def test_vacuum_raises_when_latest_snapshot_unreadable(spark, tmp_path):
    """Review r9 (high): a failed replay of the LIVE snapshot must abort
    vacuum, not silently empty the referenced set and delete the table."""
    from tulflow_spark.ext.delta_log import vacuum_delta

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 5), t)
    fsio.write_text(f"{t}/_delta_log/00000000000000000001.json", "{bad")
    with pytest.raises(DeltaProtocolError, match="malformed"):
        vacuum_delta(spark, t, min_age_seconds=0)
    assert _ids(read_delta(spark, t, version=0)) == list(range(5))


def test_vacuum_reclaims_markers_and_empty_dirs(spark, tmp_path):
    from tulflow_spark.ext.delta_log import vacuum_delta

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)
    write_delta(_df(spark, 9, 10), t, mode="overwrite")
    deleted = vacuum_delta(spark, t, min_age_seconds=0)
    assert any(d.endswith("_SUCCESS") for d in deleted)
    # the tombstoned commit's staging dir is gone entirely
    dirs = [n for n in fsio.list_names(t) if n.startswith("commit-")]
    assert len(dirs) == 1  # only the live commit's dir remains
    assert _ids(read_delta(spark, t)) == [9]


def test_optimize_partitioned_respects_target_size(spark, tmp_path):
    """Review r9 (high): per-group bin-packing must honor
    ceil(bytes/target) per PARTITION GROUP, not collapse each group
    into a single file."""
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import _replay, optimize_delta

    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 400).withColumn("b", (F.col("id") % 2).cast("int"))
    for lo in range(0, 400, 100):
        write_delta(
            _df(spark, lo, lo + 100)
            .withColumn("b", (F.col("id") % 2).cast("int"))
            .repartition(2),
            t, mode="append" if lo else "error", partition_by=["b"],
        )
    before = _replay(spark, t, None)
    sizes = [int(a["size"]) for a in before.live.values()]
    # pick a target that forces ~2 output files per partition group
    target = sum(sizes) // 4
    v = optimize_delta(spark, t, target_file_bytes=target)
    assert v is not None
    after = _replay(spark, t, None)
    per_group: dict[str, int] = {}
    for a in after.live.values():
        g = a["partitionValues"]["b"]
        per_group[g] = per_group.get(g, 0) + 1
    # each group packed into >1 file (ceil honored), but fewer than
    # before (packing reduced counts)
    assert all(n >= 2 for n in per_group.values()), per_group
    assert len(after.live) < len(before.live)
    assert _ids(read_delta(spark, t)) == list(range(400))


def test_optimize_zorder_multidim_skipping(spark, tmp_path):
    """OPTIMIZE ZORDER: after the rewrite, every file's published
    add.stats bound BOTH z-keys tightly enough that read_delta(prune=)
    skips files for predicates on EITHER dimension — and the clustered
    table's content is bit-identical."""
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import _replay, optimize_delta

    t = str(tmp_path / "tbl")
    df = (
        _df(spark, 0, 4096)
        .withColumn("x", (F.col("id") % 64).cast("bigint"))
        .withColumn("y", ((F.col("id") / 64) % 64).cast("bigint"))
    )
    # x-sorted layout: y-stats span the full domain in every file
    write_delta(df.orderBy("x").repartition(8), t)
    before = _replay(spark, t, None)
    target = sum(int(a["size"]) for a in before.live.values()) // 8
    v = optimize_delta(spark, t, target_file_bytes=target,
                       zorder_by=["x", "y"])
    assert v == 1
    after = _replay(spark, t, None)
    assert len(after.live) >= 2
    # every file's stats now bound BOTH dims to less than half the domain
    spans_ok = 0
    for a in after.live.values():
        st = json.loads(a["stats"])
        sx = st["maxValues"]["x"] - st["minValues"]["x"]
        sy = st["maxValues"]["y"] - st["minValues"]["y"]
        if sx < 64 and sy < 64 and (sx < 48 or sy < 48):
            spans_ok += 1
    assert spans_ok >= len(after.live) // 2, "z-layout boxes not tight"
    # pruning works on EITHER dim and the filtered answers are exact
    full = len(read_delta(spark, t).inputFiles())
    for col in ("x", "y"):
        pruned = read_delta(spark, t, prune=(col, 0, 7))
        assert len(pruned.inputFiles()) < full
        assert pruned.where(f"{col} BETWEEN 0 AND 7").count() == 4096 // 8
    assert _ids(read_delta(spark, t)) == list(range(4096))


def test_optimize_zorder_walls(spark, tmp_path):
    from tulflow_spark.ext.delta_log import optimize_delta

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 10).repartition(2), t)
    with pytest.raises(ValueError, match=">= 2"):
        optimize_delta(spark, t, zorder_by=["id"])
    with pytest.raises(DeltaProtocolError, match="absent"):
        optimize_delta(spark, t, zorder_by=["id", "nope"])
    # out-of-budget keys abort loudly, table unchanged
    from pyspark.sql import functions as F

    big = _df(spark, 0, 10).withColumn("k", F.lit(1 << 40).cast("bigint"))
    t2 = str(tmp_path / "tbl2")
    write_delta(big.repartition(2), t2)
    with pytest.raises(Exception, match="outside"):
        optimize_delta(spark, t2, zorder_by=["id", "k"])
    assert latest_version(t2) == 0


def test_merge_schema_append_evolution(spark, tmp_path):
    """Append-time schema evolution: added columns widen the metaData
    under the table's stable id; omitted columns read as NULL from the
    new files; type changes stay typed errors."""
    from tulflow_spark.ext.delta_log import _replay

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)
    orig_id = _replay(spark, t, None).meta_id
    # add a column
    wide = spark.createDataFrame([(10, "y", 1.5)],
                                 "id long, v string, score double")
    write_delta(wide, t, mode="append", merge_schema=True)
    out = read_delta(spark, t)
    assert out.columns == ["id", "v", "score"]
    assert out.where("score IS NULL").count() == 3  # old files: NULL
    assert out.where("score = 1.5").count() == 1
    snap = _replay(spark, t, None)
    assert snap.meta_id == orig_id  # identity stable across evolution
    # omit a column: reads as NULL from the new file
    narrow = spark.createDataFrame([(20,)], "id long")
    write_delta(narrow, t, mode="append", merge_schema=True)
    got = read_delta(spark, t).where("id = 20").collect()[0]
    assert got["v"] is None and got["score"] is None
    # plain appends now enforce the WIDENED schema
    with pytest.raises(DeltaProtocolError, match="schema mismatch"):
        write_delta(_df(spark, 0, 1), t, mode="append")
    # type evolution is refused
    retyped = spark.createDataFrame([(1, "a", 2)],
                                    "id long, v string, score long")
    with pytest.raises(DeltaProtocolError, match="no type evolution"):
        write_delta(retyped, t, mode="append", merge_schema=True)
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) \
        == [0, 1, 2, 10, 20]


def test_merge_schema_respects_appendonly_and_partitioning(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 4).withColumn("b", (F.col("id") % 2).cast("int"))
    write_delta(df, t, partition_by=["b"])
    wide = df.withColumn("extra", F.lit(1).cast("long"))
    with pytest.raises(DeltaProtocolError, match="partitioning mismatch"):
        write_delta(wide, t, mode="append", merge_schema=True)
    # merge appends stay legal on delta.appendOnly tables (evolution
    # adds, never removes) — inject the config the third-party way
    schema = df.schema.json()
    fsio.write_text(
        f"{t}/_delta_log/00000000000000000001.json",
        json.dumps({"metaData": {"id": "x", "schemaString": schema,
                    "partitionColumns": ["b"],
                    "configuration": {"delta.appendOnly": "true"}}}),
    )
    write_delta(wide, t, mode="append", partition_by=["b"],
                merge_schema=True)
    out = read_delta(spark, t)
    assert out.where("extra IS NULL").count() == 4
    assert out.where("b = id % 2").count() == 8


def test_merge_schema_case_and_nullability_rules(spark, tmp_path):
    """Review r9 (final): added columns log as NULLABLE regardless of the
    frame's flag; case-variant duplicates are refused at write time."""
    from tulflow_spark.ext.delta_log import _replay

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 2), t)
    from pyspark.sql import functions as F

    wide = _df(spark, 2, 3).withColumn("extra", F.lit(7).cast("long"))
    assert not wide.schema["extra"].nullable  # F.lit is non-nullable
    write_delta(wide, t, mode="append", merge_schema=True)
    from pyspark.sql.types import StructType

    snap = _replay(spark, t, None)
    logged = StructType.fromJson(json.loads(snap.schema_str))
    assert logged["extra"].nullable  # forced nullable in the log
    caseless = spark.createDataFrame([(9, "z", 1)],
                                     "id long, V string, extra long")
    with pytest.raises(DeltaProtocolError, match="case"):
        write_delta(caseless, t, mode="append", merge_schema=True)


def test_optimize_zorder_type_wall_and_column_collision(spark, tmp_path):
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import optimize_delta

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 10).repartition(2), t)
    with pytest.raises(DeltaProtocolError, match="not integral"):
        optimize_delta(spark, t, zorder_by=["id", "v"])  # v is string
    # a real data column named __z survives a zorder rewrite
    t2 = str(tmp_path / "tbl2")
    zdf = (
        _df(spark, 0, 64)
        .withColumn("__z", (F.col("id") * 3).cast("bigint"))
        .withColumn("y", (F.col("id") % 8).cast("bigint"))
    )
    write_delta(zdf.repartition(4), t2)
    v = optimize_delta(spark, t2, zorder_by=["__z", "y"],
                       target_file_bytes=1 << 30)
    assert v == 1
    out = read_delta(spark, t2)
    assert out.where("__z = id * 3").count() == 64  # column intact


def test_read_delta_changes_vacuumed_file_raises_typed(spark, tmp_path):
    """ADVICE r9: an in-range add that was compacted (dataChange=false
    remove) and then VACUUMED is gone from disk — the change feed must
    raise the typed re-sync error up front, not an untyped
    file-not-found mid-scan."""
    from tulflow_spark.ext.delta_log import (
        optimize_delta,
        read_delta_changes,
        vacuum_delta,
    )

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 5).repartition(2), t)                 # v0
    write_delta(_df(spark, 5, 8).repartition(2), t, mode="append")  # v1
    assert optimize_delta(spark, t) == 2                            # v2
    # before vacuum the tombstoned originals still deliver
    assert _ids(read_delta_changes(spark, t, 0)) == [5, 6, 7]
    assert vacuum_delta(spark, t, min_age_seconds=0)
    with pytest.raises(DeltaProtocolError, match="re-sync"):
        read_delta_changes(spark, t, 0)
    # ranges not touching the vacuumed files still work
    write_delta(_df(spark, 8, 9), t, mode="append")                 # v3
    assert _ids(read_delta_changes(spark, t, 2)) == [8]


def test_merge_schema_frame_internal_case_collision(spark, tmp_path):
    """ADVICE r9: two NEW columns in one frame that differ only in case
    must be refused — committing them makes every later read fail."""
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 2), t)
    bad = spark.createDataFrame([(5, "x", 1, 2)],
                                "id long, v string, extra long, EXTRA long")
    with pytest.raises(DeltaProtocolError, match="same frame"):
        write_delta(bad, t, mode="append", merge_schema=True)


def test_merge_delta_with_retry_loser_converges(spark, tmp_path, monkeypatch):
    """VERDICT r9 #6: the read-merge-write OCC loop — a racer lands
    between the loser's read and its commit; the loser must re-read,
    re-merge, and converge WITHOUT caller-side logic, and the final
    state must include BOTH the racer's rows and the merge."""
    import tulflow_spark.ext.delta_log as dl

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 5), t)                               # v0
    changes = spark.createDataFrame(
        [(1, "u", "U"), (9, "n", "I"), (2, None, "D")],
        "id long, v string, op string",
    )
    real_read = dl.read_delta
    raced = {"done": False}

    def racing_read(spark_, path_, version=None, prune=None):
        out = real_read(spark_, path_, version, prune)
        if not raced["done"]:
            raced["done"] = True
            # the racer commits AFTER the loser's read, BEFORE its CAS
            write_delta(_df(spark, 100, 102), t, mode="append")    # v1
        return out

    monkeypatch.setattr(dl, "read_delta", racing_read)
    v = dl.merge_delta_with_retry(spark, changes, t, ["id"],
                                  backoff_seconds=0.0)
    assert v == 2  # lost once at expect_version=0, won against base=1
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {0: "x0", 3: "x3", 4: "x4", 1: "u", 9: "n",
                   100: "x100", 101: "x101"}


def test_merge_delta_with_retry_walls(spark, tmp_path):
    import tulflow_spark.ext.delta_log as dl

    t = str(tmp_path / "tbl")
    changes = spark.createDataFrame([(1, "u", "U")],
                                    "id long, v string, op string")
    with pytest.raises(DeltaProtocolError, match="seed it"):
        dl.merge_delta_with_retry(spark, changes, t, ["id"])


def test_deletion_vector_delete_read_and_walls(spark, tmp_path):
    """r9 VERDICT #4: row-level DELETE via deletion vectors — no data
    rewrite, reads subtract the bitmap, destructive ops wall typed
    behind the writer-version gate, vacuum keeps live DV bins."""
    from tulflow_spark.ext.delta_log import (
        _replay,
        delete_rows_with_dv,
        optimize_delta,
        vacuum_delta,
        write_checkpoint,
    )

    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 100).coalesce(1).sortWithinPartitions("id")
    write_delta(df, t)                                             # v0
    snap = _replay(spark, t, None)
    (ap,) = snap.live
    # file sorted by id and ids dense ⇒ row_index == id
    assert delete_rows_with_dv(spark, t, {ap: [0, 5, 7, 99]}) == 1
    ids = _ids(read_delta(spark, t))
    assert len(ids) == 96 and not {0, 5, 7, 99} & set(ids)
    # same data file still backs the table — merge-on-read, no rewrite
    snap1 = _replay(spark, t, None)
    assert set(snap1.live) == {ap}
    # second delete merges with the existing DV
    assert delete_rows_with_dv(spark, t, {ap: [1]}) == 2
    assert read_delta(spark, t).count() == 95
    # time travel to the pre-DV version still sees everything
    assert read_delta(spark, t, version=0).count() == 100
    # destructive ops wall typed (writer version 7)
    with pytest.raises(DeltaProtocolError, match="deletion vectors"):
        write_checkpoint(spark, t)
    with pytest.raises(DeltaProtocolError, match="writer version 7"):
        optimize_delta(spark, t)
    with pytest.raises(DeltaProtocolError, match="writer version 7"):
        write_delta(_df(spark, 100, 101), t, mode="append")
    # vacuum deletes the SUPERSEDED v1 DV bin but keeps the live one
    deleted = vacuum_delta(spark, t, min_age_seconds=0)
    assert any("deletion_vector_" in d for d in deleted)
    assert read_delta(spark, t).count() == 95


def test_deletion_vector_partitioned_and_prune(spark, tmp_path):
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import _replay, delete_rows_with_dv

    t = str(tmp_path / "tbl")
    df = (_df(spark, 0, 40)
          .withColumn("b", (F.col("id") % 2).cast("int"))
          .repartition(1).sortWithinPartitions("b", "id"))
    write_delta(df.coalesce(1), t, partition_by=["b"])
    snap = _replay(spark, t, None)
    # per-partition files: delete row 0 of the b=0 file (lowest even id)
    target = next(p for p in snap.live
                  if (snap.live[p].get("partitionValues") or {})
                  .get("b") == "0")
    delete_rows_with_dv(spark, t, {target: [0]})
    out = read_delta(spark, t)
    assert out.count() == 39
    assert 0 not in _ids(out)          # id 0 was row 0 of b=0
    assert out.where("b = 0").count() == 19
    assert out.where("b = 1").count() == 20


def test_deletion_vector_error_paths(spark, tmp_path):
    from tulflow_spark.ext.delta_log import delete_rows_with_dv

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 5), t)
    with pytest.raises(DeltaProtocolError, match="not a live file"):
        delete_rows_with_dv(spark, t, {"nope.parquet": [0]})
    with pytest.raises(DeltaProtocolError, match="empty row-index"):
        delete_rows_with_dv(
            spark, t,
            {next(iter(_ids_live(spark, t))): []})


def _ids_live(spark, t):
    from tulflow_spark.ext.delta_log import _replay

    return _replay(spark, t, None).live


def test_reader_version_gate_features(spark, tmp_path):
    """minReaderVersion 1/2 pass, 3 passes only with the implemented
    feature set (deletionVectors, columnMapping); anything else walls
    typed."""
    from tulflow_spark.ext.delta_log import _check_reader_version

    _check_reader_version({"minReaderVersion": 1})
    _check_reader_version({"minReaderVersion": 2})  # column mapping cap
    _check_reader_version({"minReaderVersion": 3,
                           "readerFeatures": ["deletionVectors"]})
    _check_reader_version({"minReaderVersion": 3, "readerFeatures": []})
    _check_reader_version({
        "minReaderVersion": 3,
        "readerFeatures": ["deletionVectors", "columnMapping"]})
    with pytest.raises(DeltaProtocolError, match="timestampNtz"):
        _check_reader_version({
            "minReaderVersion": 3,
            "readerFeatures": ["deletionVectors", "timestampNtz"]})
    with pytest.raises(DeltaProtocolError, match="version 3"):
        _check_reader_version({"minReaderVersion": 3})  # malformed: no feats
    with pytest.raises(DeltaProtocolError, match="version 4"):
        _check_reader_version({"minReaderVersion": 4,
                               "readerFeatures": ["v2Checkpoint"]})


# ---------------------------------------------------------------------------
# column mapping (mode=name) — reader support, r10 VERDICT-gap item
# ---------------------------------------------------------------------------


def test_column_mapping_roundtrip_and_timetravel(spark, tmp_path):
    """write_column_mapped_fixture → read_delta resolves physical
    col-NNNN data columns back to logical names with typed values."""
    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    t = str(tmp_path / "tbl")
    assert write_column_mapped_fixture(spark, _df(spark, 0, 20), t) == 0
    got = read_delta(spark, t)
    assert [f.name for f in got.schema.fields] == ["id", "v"]
    assert got.schema["id"].dataType.simpleString() == "bigint"
    assert {r["id"]: r["v"] for r in got.collect()} == {
        i: f"x{i}" for i in range(20)
    }
    # the data files really carry physical names (not a no-op mapping)
    raw = spark.read.parquet(*[f for f in got.inputFiles()])
    assert [c for c in raw.columns] == ["col-0000", "col-0001"]
    assert read_delta(spark, t, version=0).count() == 20


def test_column_mapping_partitioned_and_prune(spark, tmp_path):
    """partitionValues live in PHYSICAL name space; prune= takes the
    LOGICAL column name and still skips files."""
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 40).withColumn(
        "bucket", (F.col("id") % 4).cast("long"))
    write_column_mapped_fixture(spark, df, t, partition_by=["bucket"])
    got = read_delta(spark, t)
    assert sorted(got.columns) == ["bucket", "id", "v"]
    assert got.count() == 40
    assert got.filter("bucket = 2").count() == 10
    # logical-name prune on the partition column skips 3 of 4 groups
    pruned = read_delta(spark, t, prune=("bucket", 1, 1))
    assert _ids(pruned) == sorted(i for i in range(40) if i % 4 == 1)
    assert len(pruned.inputFiles()) < len(got.inputFiles())
    # prune on a non-partition logical column uses physical add.stats
    lo = read_delta(spark, t, prune=("id", 0, 0))
    assert 0 in set(_ids(lo))


def test_column_mapping_hand_authored_log(spark, tmp_path):
    """Third-party-shaped mapped table: parquet + JSON log written by
    hand (independent of the fixture writer) must read back with
    logical names — pins the reader against the protocol."""
    import os

    t = str(tmp_path / "tbl")
    os.makedirs(f"{t}/_delta_log")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "`phys_k` long, `phys_txt` string"
    ).coalesce(1).write.parquet(f"{t}/data")
    part = [f for f in os.listdir(f"{t}/data")
            if f.endswith(".parquet")][0]
    schema_string = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "phys_k"}},
        {"name": "txt", "type": "string", "nullable": True, "metadata": {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": "phys_txt"}},
    ]})
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
        }},
        {"add": {"path": f"data/{part}", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    with open(f"{t}/_delta_log/{0:020d}.json", "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    got = read_delta(spark, t)
    assert got.columns == ["k", "txt"]
    assert {r["k"]: r["txt"] for r in got.collect()} == {1: "a", 2: "b"}


def test_column_mapping_changes_resolve_logical(spark, tmp_path):
    """read_delta_changes on a mapped table must NOT leak physical
    column names (configuration carries into the change-scan snapshot)."""
    from tulflow_spark.ext.delta_log import (
        read_delta_changes,
        write_column_mapped_fixture,
    )

    t = str(tmp_path / "tbl")
    write_column_mapped_fixture(spark, _df(spark, 0, 7), t)
    ch = read_delta_changes(spark, t, from_version=-1)
    assert ch.columns == ["id", "v"]
    assert _ids(ch) == list(range(7))


def test_column_mapping_walls(spark, tmp_path):
    """mode=id and malformed mappings wall typed; every mutating op
    refuses a mapped table (writer version 5 / explicit guards)."""
    from tulflow_spark.ext.delta_log import (
        _build_scan,
        _replay,
        delete_rows_with_dv,
        optimize_delta,
        vacuum_delta,
        write_column_mapped_fixture,
    )

    t = str(tmp_path / "tbl")
    write_column_mapped_fixture(spark, _df(spark, 0, 5), t)
    with pytest.raises(DeltaProtocolError, match="already exists"):
        write_column_mapped_fixture(spark, _df(spark, 0, 5), t)
    with pytest.raises(DeltaProtocolError, match="writer version 5"):
        write_delta(_df(spark, 5, 9), t, mode="append")
    with pytest.raises(DeltaProtocolError, match="writer version 5"):
        optimize_delta(spark, t)
    # vacuum never writes the log and works in raw add.path space, so
    # it is mapping-agnostic: legal, reclaims only writer markers
    gone = vacuum_delta(spark, t, min_age_seconds=0.0)
    assert not [p for p in gone if p.endswith(".parquet")]
    assert read_delta(spark, t).count() == 5
    with pytest.raises(DeltaProtocolError, match="column-mapped"):
        write_checkpoint(spark, t)
    snap = _replay(spark, t, None)
    with pytest.raises(DeltaProtocolError, match="column-mapped"):
        delete_rows_with_dv(spark, t, {next(iter(snap.live)): [0]})
    # mode=id over files WITHOUT parquet field ids walls at scan time
    # (resolving by name would silently misread renamed columns)
    snap.configuration = dict(snap.configuration,
                              **{"delta.columnMapping.mode": "id"})
    with pytest.raises(DeltaProtocolError, match="field ids"):
        _build_scan(spark, t, snap).collect()
    # mapped mode with a column missing physicalName is malformed
    snap2 = _replay(spark, t, None)
    stripped = json.loads(snap2.schema_str)
    for f in stripped["fields"]:
        f["metadata"] = {}
    snap2.schema_str = json.dumps(stripped)
    with pytest.raises(DeltaProtocolError, match="physicalName"):
        _build_scan(spark, t, snap2)


# ---------------------------------------------------------------------------
# table-features protocol preservation (review findings r11)
# ---------------------------------------------------------------------------


def _append_commit(t: str, version: int, actions: list[dict]) -> None:
    with open(f"{t}/_delta_log/{version:020d}.json", "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def test_dv_delete_refuses_foreign_writer_features(spark, tmp_path):
    """A writer-7 table declaring features beyond deletionVectors must
    not be mutated: the DV commit's protocol action would clobber
    feature declarations conformant writers depend on."""
    from tulflow_spark.ext.delta_log import delete_rows_with_dv, _replay

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 10).coalesce(1), t)              # v0
    _append_commit(t, 1, [{"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors", "checkConstraints"],
    }}])
    assert read_delta(spark, t).count() == 10  # still readable
    snap = _replay(spark, t, None)
    with pytest.raises(DeltaProtocolError, match="checkConstraints"):
        delete_rows_with_dv(spark, t, {next(iter(snap.live)): [0]})
    # legacy writer versions 3-6 (implied features, no lists) refuse too
    t2 = str(tmp_path / "tbl2")
    write_delta(_df(spark, 0, 4).coalesce(1), t2)
    _append_commit(t2, 1, [{"protocol": {
        "minReaderVersion": 1, "minWriterVersion": 4}}])
    snap2 = _replay(spark, t2, None)
    with pytest.raises(DeltaProtocolError, match="writer version 4"):
        delete_rows_with_dv(spark, t2, {next(iter(snap2.live)): [0]})


def test_checkpoint_refuses_feature_table_without_live_dvs(
        spark, tmp_path):
    """A reader-3 deletionVectors table whose DVs were rewritten away
    still must not checkpoint: the checkpoint protocol row carries no
    feature lists, so it would downgrade the reader gate (and record a
    spec-invalid bare writer-7)."""
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 6), t)                           # v0
    _append_commit(t, 1, [{"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }}])
    assert read_delta(spark, t).count() == 6
    with pytest.raises(DeltaProtocolError, match="table-features"):
        write_checkpoint(spark, t)


def test_vacuum_keeps_live_absolute_path_dv(spark, tmp_path):
    """A live 'p' (absolute-path) deletion vector stored INSIDE the
    table root must survive vacuum — deleting it would break every
    later read of its data file."""
    import pathlib

    from tulflow_spark.ext.delta_log import (
        delete_rows_with_dv,
        vacuum_delta,
    )

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 30).coalesce(1).sortWithinPartitions("id"),
                t)                                             # v0
    from tulflow_spark.ext.delta_log import _replay

    (ap,) = _replay(spark, t, None).live
    delete_rows_with_dv(spark, t, {ap: [0, 1, 2]})             # v1
    (bin_path,) = list(pathlib.Path(t).glob("deletion_vector_*.bin"))
    # rewrite the v1 commit's descriptor as storageType 'p' (absolute)
    lines = [json.loads(ln) for ln in
             open(f"{t}/_delta_log/{1:020d}.json") if ln.strip()]
    for a in lines:
        dv = (a.get("add") or {}).get("deletionVector")
        if dv:
            dv["storageType"] = "p"
            dv["pathOrInlineDv"] = str(bin_path)
    _append_commit(t, 1, lines)  # overwrite in place
    assert read_delta(spark, t).count() == 27  # 'p' descriptor reads
    gone = vacuum_delta(spark, t, min_age_seconds=0.0)
    assert bin_path.exists(), f"vacuum deleted live DV: {gone}"
    assert read_delta(spark, t).count() == 27


# ---------------------------------------------------------------------------
# column mapping mode=id (r12: r11 VERDICT #7)
# ---------------------------------------------------------------------------


def _retag_footer(fp: str, renames: dict[str, str]) -> None:
    """Rewrite one parquet file with renamed footer columns, KEEPING
    their field ids — models a file written before a rename on a
    mode=id table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(fp)
    fields = [
        pa.field(renames.get(f.name, f.name), f.type,
                 metadata=f.metadata)
        for f in tbl.schema
    ]
    pq.write_table(tbl.rename_columns(
        [renames.get(n, n) for n in tbl.column_names]
    ).cast(pa.schema(fields)), fp)
    # drop the stale Hadoop checksum sidecar or Spark refuses the read
    import os

    crc = os.path.join(os.path.dirname(fp),
                       f".{os.path.basename(fp)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_column_mapping_id_roundtrip(spark, tmp_path):
    """mode=id fixture: data files carry physical names AND footer
    field ids; reads resolve logical columns by id."""
    import pyarrow.parquet as pq

    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    t = str(tmp_path / "tbl")
    write_column_mapped_fixture(spark, _df(spark, 0, 12), t, mode="id")
    got = read_delta(spark, t)
    assert got.columns == ["id", "v"]
    assert {r["id"]: r["v"] for r in got.collect()} == {
        i: f"x{i}" for i in range(12)}
    raw = pq.ParquetFile(got.inputFiles()[0][7:]).schema_arrow
    assert raw.names == ["col-0000", "col-0001"]
    assert [int((f.metadata or {})[b"PARQUET:field_id"])
            for f in raw] == [1, 2]


def test_column_mapping_id_resolves_renamed_footers(spark, tmp_path):
    """The reason mode=id exists: a file whose footer names differ
    from the current physicalName still binds by field id — and a
    same-typed column swap in footer NAME order must not swap
    values."""
    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    t = str(tmp_path / "tbl")
    write_column_mapped_fixture(spark, _df(spark, 0, 9), t, mode="id")
    fp = read_delta(spark, t).inputFiles()[0][7:]
    _retag_footer(fp, {"col-0000": "legacy_id", "col-0001": "legacy_v"})
    got = read_delta(spark, t)
    assert got.columns == ["id", "v"]
    assert {r["id"]: r["v"] for r in got.collect()} == {
        i: f"x{i}" for i in range(9)}


def test_column_mapping_id_added_column_null_fills(spark, tmp_path):
    """A schema column whose id is absent from a file's footer (the
    file predates the column) reads as NULL for that file."""
    from tulflow_spark.ext.delta_log import (
        _replay,
        write_column_mapped_fixture,
    )

    t = str(tmp_path / "tbl")
    write_column_mapped_fixture(spark, _df(spark, 0, 6), t, mode="id")
    # add a third mapped column to the schema via a metaData commit
    snap = _replay(spark, t, None)
    schema = json.loads(snap.schema_str)
    schema["fields"].append({
        "name": "extra", "type": "string", "nullable": True,
        "metadata": {"delta.columnMapping.id": 3,
                     "delta.columnMapping.physicalName": "col-0002"}})
    actions = [{"metaData": {
        "id": snap.meta_id,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(schema),
        "partitionColumns": [],
        "configuration": dict(snap.configuration),
    }}]
    _append_commit(t, 1, actions)
    got = read_delta(spark, t)
    assert got.columns == ["id", "v", "extra"]
    rows = got.collect()
    assert all(r["extra"] is None for r in rows)
    assert sorted(r["id"] for r in rows) == list(range(6))


def test_column_mapping_id_partitioned_and_prune(spark, tmp_path):
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 40).withColumn(
        "bucket", (F.col("id") % 4).cast("long"))
    write_column_mapped_fixture(spark, df, t, partition_by=["bucket"],
                                mode="id")
    got = read_delta(spark, t)
    assert sorted(got.columns) == ["bucket", "id", "v"]
    assert got.count() == 40
    assert got.filter("bucket = 2").count() == 10
    pruned = read_delta(spark, t, prune=("bucket", 1, 1))
    assert _ids(pruned) == sorted(i for i in range(40) if i % 4 == 1)
    assert len(pruned.inputFiles()) < len(got.inputFiles())


def test_reorg_delta_purge_pays_down_dv_debt(spark, tmp_path):
    """r15 (Delta face of the maintenance story): REORG APPLY (PURGE)
    rewrites ONLY the DV-carrying files without their dead rows and
    drops the descriptors — the one way a writer-7 DV table's
    merge-on-read debt clears (OPTIMIZE refuses it).  Untouched files
    carry over by reference, the commit is layout-only
    (dataChange=false throughout), time travel below it still
    subtracts the DV, and a second purge finds nothing."""
    import json as _json

    from tulflow_spark.ext.delta_log import (
        _replay,
        delete_rows_with_dv,
        reorg_delta_purge,
    )

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 50).coalesce(1)
                .sortWithinPartitions("id"), t)                    # v0
    write_delta(_df(spark, 50, 60).coalesce(1)
                .sortWithinPartitions("id"), t, mode="append")     # v1
    snap = _replay(spark, t, None)

    def _min_id(a):
        return _json.loads(a["stats"])["minValues"]["id"]

    pa = next(p for p, a in snap.live.items() if _min_id(a) == 0)
    pb = next(p for p, a in snap.live.items() if _min_id(a) == 50)
    assert delete_rows_with_dv(spark, t, {pa: [0, 5, 7]}) == 2
    assert reorg_delta_purge(spark, t) == 3
    ids = _ids(read_delta(spark, t))
    assert len(ids) == 57 and not {0, 5, 7} & set(ids)
    snap3 = _replay(spark, t, None)
    assert pb in snap3.live and pa not in snap3.live
    assert not any(a.get("deletionVector")
                   for a in snap3.live.values())
    # layout-only commit: every action carries dataChange=false
    with open(f"{t}/_delta_log/{3:020d}.json") as fh:
        acts = [_json.loads(ln) for ln in fh.read().splitlines()]
    for a in acts:
        if "add" in a:
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False
    # history intact: pre-purge versions still subtract the DV
    assert read_delta(spark, t, version=2).count() == 57
    assert read_delta(spark, t, version=1).count() == 60
    assert reorg_delta_purge(spark, t) is None


def test_reorg_delta_purge_all_dead_file_retires(spark, tmp_path):
    """A file whose DV kills every row purges to a plain remove — no
    zero-row re-add enters the log."""
    import json as _json

    from tulflow_spark.ext.delta_log import (
        _replay,
        delete_rows_with_dv,
        reorg_delta_purge,
    )

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 50).coalesce(1)
                .sortWithinPartitions("id"), t)                    # v0
    write_delta(_df(spark, 50, 60).coalesce(1)
                .sortWithinPartitions("id"), t, mode="append")     # v1
    snap = _replay(spark, t, None)
    pb = next(p for p, a in snap.live.items()
              if _json.loads(a["stats"])["minValues"]["id"] == 50)
    delete_rows_with_dv(spark, t, {pb: list(range(10))})           # v2
    assert reorg_delta_purge(spark, t) == 3
    snap3 = _replay(spark, t, None)
    assert pb not in snap3.live
    assert len(snap3.live) == 1
    assert read_delta(spark, t).count() == 50
    for a in snap3.live.values():
        n = _json.loads(a["stats"])["numRecords"]
        assert n > 0


def test_reorg_delta_purge_partitioned_mixed_victims(spark, tmp_path):
    """Partitioned purge: a partially-dead victim in one partition
    rewrites to ONE file under its partition dir (partitionValues
    re-derived from the hive layout); an ALL-dead victim in the other
    partition retires with no re-add; the untouched partition file
    carries over by reference."""
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import (
        _replay,
        delete_rows_with_dv,
        reorg_delta_purge,
    )

    t = str(tmp_path / "tbl")
    df = (_df(spark, 0, 60)
          .withColumn("b", (F.col("id") % 3).cast("int"))
          .repartition(1).sortWithinPartitions("b", "id"))
    write_delta(df.coalesce(1), t, partition_by=["b"])             # v0
    snap = _replay(spark, t, None)

    def _part(p):
        return (snap.live[p].get("partitionValues") or {}).get("b")

    p0 = next(p for p in snap.live if _part(p) == "0")
    p1 = next(p for p in snap.live if _part(p) == "1")
    p2 = next(p for p in snap.live if _part(p) == "2")
    delete_rows_with_dv(spark, t, {p0: [0, 3],                     # v1
                                   p1: list(range(20))})  # all dead
    assert read_delta(spark, t).count() == 38
    assert reorg_delta_purge(spark, t) == 2
    out = read_delta(spark, t)
    assert out.count() == 38
    assert out.where("b = 1").count() == 0
    assert out.where("b = 0").count() == 18
    assert out.where("b = 2").count() == 20
    snap2 = _replay(spark, t, None)
    assert p2 in snap2.live                  # untouched carries over
    assert p0 not in snap2.live and p1 not in snap2.live
    assert not any(a.get("deletionVector")
                   for a in snap2.live.values())
    # one-in-one-out: exactly one re-added file, under b=0's dir
    new = [p for p in snap2.live if p != p2]
    assert len(new) == 1
    assert (snap2.live[new[0]].get("partitionValues") or {}) \
        == {"b": "0"}
    # the b=0 file holds ids 0,3,6,9,... sorted, so positions 0 and 3
    # are ids 0 and 9 — exactly those are gone
    ids0 = set(_ids(out.where("b = 0")))
    assert 0 not in ids0 and 9 not in ids0 and 3 in ids0
