"""sources/lake_stream.py: Structured Streaming source over the Delta
change feed (Spark 4 Python Data Source API).

Pins: full replay with typed partition-value injection, exactly-once
incremental delivery across query RESTARTS (Spark's own offset log),
layout-only commits invisible, non-append commits fail the batch
typed, and the sparkless (pyarrow) checkpoint replay the planner
needs."""

from __future__ import annotations

import pytest

from tulflow_spark.ext.delta_log import (
    delete_where,
    optimize_delta,
    write_checkpoint,
    write_delta,
)
from tulflow_spark.sources.lake_stream import (
    DeltaChangeFeedError,
    DeltaChangesSource,
    DeltaChangesStreamReader,
)


def _df(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)], "id long, v string"
    ).withColumn("b", (F.col("id") % 2).cast("long"))


def _drain(spark, path, out, checkpoint, starting=None):
    """One availableNow pass into a restart-capable parquet sink;
    returns ALL ids accumulated in the sink so far."""
    reader = (spark.readStream.format("tulflow_delta_changes")
              .option("path", path))
    if starting is not None:
        reader = reader.option("startingVersion", str(starting))
    q = (reader.load().writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    try:
        return sorted(r["id"] for r in
                      spark.read.parquet(out).select("id").collect())
    except Exception:
        return []    # sink dir still empty: nothing delivered yet


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(DeltaChangesSource)
    return spark


def test_replay_and_partition_values(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 8), t, partition_by=["b"])
    got = (spark.readStream.format("tulflow_delta_changes")
           .option("path", t).option("startingVersion", "-1").load())
    assert got.schema.simpleString() == \
        "struct<id:bigint,v:string,b:bigint>"
    q = (got.writeStream.format("memory").queryName("rp")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from rp").collect()
    assert sorted(r["id"] for r in rows) == list(range(8))
    # partition column injected from the LOG with the schema's type
    assert all(r["b"] == r["id"] % 2 for r in rows)


def test_exactly_once_across_restarts(registered, tmp_path):
    """The flagship property: Spark's offset log + our version offsets
    deliver each commit exactly once across query restarts."""
    spark = registered
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_delta(_df(spark, 0, 5), t, partition_by=["b"])      # v0
    assert _drain(spark, t, out, ckpt, starting=-1) == list(range(5))
    write_delta(_df(spark, 5, 9), t, mode="append",
                partition_by=["b"])                           # v1
    write_delta(_df(spark, 9, 11), t, mode="append",
                partition_by=["b"])                           # v2
    # restart from the SAME checkpoint: v1+v2 arrive exactly once
    assert _drain(spark, t, out, ckpt, starting=-1) == \
        list(range(11))
    # a third restart with nothing new delivers nothing new
    assert _drain(spark, t, out, ckpt, starting=-1) == \
        list(range(11))


def test_optimize_commits_invisible(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_delta(_df(spark, 0, 4).repartition(4), t)           # v0
    assert _drain(spark, t, out, ckpt, starting=-1) == list(range(4))
    assert optimize_delta(spark, t, min_files=2) == 1         # v1
    # layout-only commit: no new rows delivered, no error
    assert _drain(spark, t, out, ckpt, starting=-1) == list(range(4))


def test_delete_in_range_fails_typed(registered, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    spark = registered
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_delta(_df(spark, 0, 6), t)                          # v0
    assert _drain(spark, t, out, ckpt, starting=-1) == list(range(6))
    delete_where(spark, t, "id >= 4")                         # v1
    q = (spark.readStream.format("tulflow_delta_changes")
         .option("path", t).option("startingVersion", "-1").load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    with pytest.raises(StreamingQueryException,
                       match="not append-only"):
        q.awaitTermination(180)


def test_planner_replays_checkpointed_tables_without_spark(
        spark, tmp_path):
    """The data-source planner runs in a sparkless Python worker:
    _replay(None, ...) must resume from parquet checkpoints via
    pyarrow and agree with the Spark path field-for-field."""
    from tulflow_spark.ext.delta_log import _replay

    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 6), t, partition_by=["b"],
                txn=("app", 3))
    write_delta(_df(spark, 6, 8), t, mode="append",
                partition_by=["b"])
    write_checkpoint(spark, t)
    a = _replay(spark, t, None)
    b = _replay(None, t, None)
    assert set(a.live) == set(b.live)
    assert a.schema_str == b.schema_str
    assert a.partition_cols == b.partition_cols
    assert a.configuration == b.configuration
    assert a.txns == b.txns
    assert (a.min_writer, a.min_reader) == (b.min_writer, b.min_reader)


def test_reader_option_walls(tmp_path):
    with pytest.raises(DeltaChangeFeedError, match="path"):
        DeltaChangesStreamReader(None, {})
    r = DeltaChangesStreamReader(None, {"path": str(tmp_path / "no")})
    with pytest.raises(DeltaChangeFeedError, match="no delta table"):
        r.initialOffset()


def test_iceberg_streaming_source(spark, tmp_path):
    """Iceberg twin: sequence-number offsets, exactly-once across
    restarts, non-append snapshots fail typed."""
    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        delete_positions_iceberg_fixture,
        write_iceberg_fixture,
    )
    from tulflow_spark.sources.lake_stream import IcebergChangesSource

    spark.dataSource.register(IcebergChangesSource)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_iceberg_fixture(spark, _df(spark, 0, 5), t)

    def drain():
        q = (spark.readStream.format("tulflow_iceberg_changes")
             .option("path", t).option("startingSequence", "0").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        try:
            return sorted(r["id"] for r in
                          spark.read.parquet(out).select("id").collect())
        except Exception:
            return []

    assert drain() == list(range(5))
    append_iceberg_fixture(spark, _df(spark, 5, 8), t)
    assert drain() == list(range(8))       # only the new batch arrived
    assert drain() == list(range(8))       # nothing new: no duplicates
    # a positional-delete snapshot in range fails the batch typed
    import pyarrow.parquet as pq_

    from tulflow_spark.ext.iceberg import _live_files, load_table_metadata

    files, _ = _live_files(load_table_metadata(t), None)
    delete_positions_iceberg_fixture(spark, t, {files[0]["file_path"]: [0]})
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = (spark.readStream.format("tulflow_iceberg_changes")
         .option("path", t).option("startingSequence", "0").load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    with pytest.raises(StreamingQueryException, match="not append-only"):
        q.awaitTermination(180)


def test_delta_stream_int_partition_and_mapped_wall(
        registered, tmp_path):
    """Partition values inject with the DECLARED Arrow type (an int32
    column must not arrive int64); column-mapped tables wall typed."""
    from pyspark.sql import functions as F

    spark = registered
    t = str(tmp_path / "tbl")
    df = (spark.createDataFrame([(i, f"x{i}") for i in range(6)],
                                "id long, v string")
          .withColumn("y", (F.col("id") % 2).cast("int")))
    write_delta(df, t, partition_by=["y"])
    got = (spark.readStream.format("tulflow_delta_changes")
           .option("path", t).option("startingVersion", "-1").load())
    q = (got.writeStream.format("memory").queryName("ip")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from ip").collect()
    assert sorted(r["id"] for r in rows) == list(range(6))
    assert all(r["y"] == r["id"] % 2 for r in rows)
    # an UNKNOWN mapping mode stays a typed wall
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    t2 = str(tmp_path / "tbl2")
    write_column_mapped_fixture(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"),
        t2)
    import json as _json

    commit = f"{t2}/_delta_log/{0:020d}.json"
    lines = [
        _json.loads(ln) for ln in open(commit).read().splitlines() if ln
    ]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"][
                "delta.columnMapping.mode"] = "weird"
    open(commit, "w").write(
        "\n".join(_json.dumps(a) for a in lines) + "\n")
    q2 = (spark.readStream.format("tulflow_delta_changes")
          .option("path", t2).option("startingVersion", "-1").load()
          .writeStream.format("memory").queryName("cm")
          .trigger(availableNow=True).start())
    with pytest.raises(StreamingQueryException, match="column mapping"):
        q2.awaitTermination(180)


def test_delta_stream_reads_column_mapped_tables(registered, tmp_path):
    """r12: the streaming source resolves column-mapped tables —
    mode=name via physicalName, mode=id via footer field ids (renamed
    footers bind correctly; partitionValues key physically)."""
    from pyspark.sql import functions as F

    from tulflow_spark.ext.delta_log import write_column_mapped_fixture

    spark = registered
    df = (spark.createDataFrame([(i, f"x{i}") for i in range(8)],
                                "id long, v string")
          .withColumn("b", (F.col("id") % 2).cast("long")))
    # mode=name, partitioned
    t1 = str(tmp_path / "t1")
    write_column_mapped_fixture(spark, df, t1, partition_by=["b"])
    q = (spark.readStream.format("tulflow_delta_changes")
         .option("path", t1).option("startingVersion", "-1").load()
         .writeStream.format("memory").queryName("cmn")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from cmn").collect()
    assert sorted(r["id"] for r in rows) == list(range(8))
    assert all(r["v"] == f"x{r['id']}" and r["b"] == r["id"] % 2
               for r in rows)
    # mode=id with a RENAMED footer (values must bind by field id)
    from tests.test_delta_log import _retag_footer
    from tulflow_spark.ext.delta_log import read_delta

    t2 = str(tmp_path / "t2")
    write_column_mapped_fixture(spark, df.drop("b"), t2, mode="id")
    fp = read_delta(spark, t2).inputFiles()[0][7:]
    _retag_footer(fp, {"col-0000": "legacy_id", "col-0001": "legacy_v"})
    q = (spark.readStream.format("tulflow_delta_changes")
         .option("path", t2).option("startingVersion", "-1").load()
         .writeStream.format("memory").queryName("cmi")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from cmi").collect()
    assert {r["id"]: r["v"] for r in rows} == {
        i: f"x{i}" for i in range(8)}


def test_iceberg_stream_expired_range_fails_typed(spark, tmp_path):
    """Snapshots expired out of a replayed range must fail the batch
    typed, never commit an empty batch (silent data loss)."""
    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        expire_iceberg_snapshots,
        write_iceberg_fixture,
    )
    from tulflow_spark.sources.lake_stream import (
        IcebergChangesStreamReader,
    )

    t = str(tmp_path / "tbl")
    write_iceberg_fixture(spark, _df(spark, 0, 4), t)     # seq 1
    append_iceberg_fixture(spark, _df(spark, 4, 6), t)    # seq 2
    append_iceberg_fixture(spark, _df(spark, 6, 8), t)    # seq 3
    expire_iceberg_snapshots(spark, t, keep_last=1,
                             min_age_seconds=0.0)
    from pyspark.sql.types import StructType

    r = IcebergChangesStreamReader(
        StructType.fromDDL("id long, v string, b long"), {"path": t})
    with pytest.raises(DeltaChangeFeedError, match="expired"):
        r.partitions({"seq": 0}, {"seq": 1})
    with pytest.raises(DeltaChangeFeedError, match="re-sync"):
        r.partitions({"seq": 0}, {"seq": 3})   # partial gap (1,2 gone)
    assert len(r.partitions({"seq": 2}, {"seq": 3})) >= 1  # intact tail


# ---------------------------------------------------------------------------
# admission control (r11 VERDICT #3): a backlogged table must drain
# over MULTIPLE capped micro-batches, exactly-once across restarts
# ---------------------------------------------------------------------------


def test_delta_admission_control_drains_capped(registered, tmp_path):
    """10-commit backlog + maxVersionsPerBatch=3: each availableNow
    run (a restart mid-drain) delivers exactly one capped batch; the
    backlog drains over several runs with no duplicates."""
    import glob
    import os

    spark = registered
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_delta(_df(spark, 0, 2), t)                          # v0
    for k in range(1, 10):                                    # v1..v9
        write_delta(_df(spark, 2 * k, 2 * k + 2), t, mode="append")

    def run():
        q = (spark.readStream.format("tulflow_delta_changes")
             .option("path", t).option("startingVersion", "-1")
             .option("maxVersionsPerBatch", "3").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        ids = sorted(r["id"] for r in
                     spark.read.parquet(out).select("id").collect())
        return ids, len(glob.glob(f"{ckpt}/offsets/*"))

    ids, nb = run()
    assert ids == list(range(6)) and nb == 1     # (-1, 2]: capped
    ids, nb = run()
    assert ids == list(range(12)) and nb == 2    # (2, 5]
    ids, nb = run()
    assert ids == list(range(18)) and nb == 3    # (5, 8]
    ids, nb = run()
    assert ids == list(range(20)) and nb == 4    # (8, 9]: remainder
    ids, _ = run()
    assert ids == list(range(20))                # drained: no dupes


def test_delta_admission_control_single_run(registered, tmp_path):
    """Default trigger + processAllAvailable: the capped stream still
    reaches the head, through >1 micro-batch in ONE query run."""
    import glob

    spark = registered
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_delta(_df(spark, 0, 2), t)
    for k in range(1, 6):                                     # v1..v5
        write_delta(_df(spark, 2 * k, 2 * k + 2), t, mode="append")
    q = (spark.readStream.format("tulflow_delta_changes")
         .option("path", t).option("startingVersion", "-1")
         .option("maxVersionsPerBatch", "2").load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    q.stop()
    ids = sorted(r["id"] for r in
                 spark.read.parquet(out).select("id").collect())
    assert ids == list(range(12))
    assert len(glob.glob(f"{ckpt}/offsets/*")) >= 3   # (-1,1](1,3](3,5]


def test_admission_control_option_walls(tmp_path):
    from tulflow_spark.sources.lake_stream import (
        IcebergChangesStreamReader,
    )

    with pytest.raises(DeltaChangeFeedError, match=">= 1"):
        DeltaChangesStreamReader(
            None, {"path": "x", "maxversionsperbatch": "0"})
    with pytest.raises(DeltaChangeFeedError, match=">= 1"):
        IcebergChangesStreamReader(
            None, {"path": "x", "maxsequencesperbatch": "-2"})


def test_iceberg_admission_control_drains_capped(spark, tmp_path):
    import glob

    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        write_iceberg_fixture,
    )
    from tulflow_spark.sources.lake_stream import IcebergChangesSource

    spark.dataSource.register(IcebergChangesSource)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_iceberg_fixture(spark, _df(spark, 0, 2), t)         # seq 1
    for k in range(1, 4):                                     # seq 2..4
        append_iceberg_fixture(spark, _df(spark, 2 * k, 2 * k + 2), t)

    def run():
        q = (spark.readStream.format("tulflow_iceberg_changes")
             .option("path", t).option("startingSequence", "0")
             .option("maxSequencesPerBatch", "2").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        ids = sorted(r["id"] for r in
                     spark.read.parquet(out).select("id").collect())
        return ids, len(glob.glob(f"{ckpt}/offsets/*"))

    ids, nb = run()
    assert ids == list(range(4)) and nb == 1     # seqs 1..2
    ids, nb = run()
    assert ids == list(range(8)) and nb == 2     # seqs 3..4
    ids, _ = run()
    assert ids == list(range(8))                 # drained, no dupes


def test_iceberg_stream_binds_columns_by_name(spark, tmp_path):
    """A data file whose physical column ORDER differs from the table
    schema must not silently swap same-typed columns (Spark binds
    returned Arrow batches positionally); a file MISSING a schema
    column fails typed."""
    import pyarrow.parquet as pq_

    from tulflow_spark.ext.iceberg import (
        _live_files,
        load_table_metadata,
        write_iceberg_fixture,
    )
    from tulflow_spark.sources.lake_stream import IcebergChangesSource

    spark.dataSource.register(IcebergChangesSource)
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"x{i}", i + 100) for i in range(6)],
        "id long, v string, b long")
    write_iceberg_fixture(spark, df, t)
    files, _ = _live_files(load_table_metadata(t), None)
    fp = files[0]["file_path"][7:]
    tbl = pq_.read_table(fp).select(["b", "v", "id"])   # reorder
    pq_.write_table(tbl, fp)

    def drain(name):
        q = (spark.readStream.format("tulflow_iceberg_changes")
             .option("path", t).option("startingSequence", "0").load()
             .writeStream.format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return spark.sql(f"select * from {name}").collect()

    rows = drain("bycol")
    assert sorted(r["id"] for r in rows) == list(range(6))
    assert all(r["b"] == r["id"] + 100 for r in rows)   # not swapped
    # a file missing a column's FIELD ID predates it: null-fill (spec
    # add-column semantics, r12 — ids survive the pyarrow select)
    pq_.write_table(pq_.read_table(fp).select(["v", "id"]), fp)
    rows = drain("missingcol")
    assert sorted(r["id"] for r in rows) == list(range(6))
    assert all(r["b"] is None for r in rows)
    # an ID-LESS file with a renamed column stays typed, never a
    # silent misread
    import pyarrow as pa_

    tbl2 = pq_.read_table(fp)
    stripped = pa_.schema(
        [pa_.field("v", pa_.string()), pa_.field("renamed", pa_.int64())])
    pq_.write_table(tbl2.rename_columns(["v", "renamed"]).cast(stripped),
                    fp)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = (spark.readStream.format("tulflow_iceberg_changes")
         .option("path", t).option("startingSequence", "0").load()
         .writeStream.format("memory").queryName("idless")
         .trigger(availableNow=True).start())
    with pytest.raises(StreamingQueryException,
                       match="lacks stream schema"):
        q.awaitTermination(180)


def test_delta_stream_null_fills_added_columns(registered, tmp_path):
    """r12 review finding: files that PREDATE a column (add-column
    evolution) stream with nulls for it — matching the batch reader —
    instead of killing the query."""
    import json as _json

    from tulflow_spark.ext.delta_log import _replay, latest_version

    spark = registered
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 4).drop("b"), t)                # v0
    snap = _replay(spark, t, None)
    schema = _json.loads(snap.schema_str)
    schema["fields"].append({"name": "extra", "type": "long",
                             "nullable": True, "metadata": {}})
    actions = [{"metaData": {
        "id": snap.meta_id,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _json.dumps(schema),
        "partitionColumns": [],
        "configuration": dict(snap.configuration),
    }}]
    v = latest_version(t) + 1
    with open(f"{t}/_delta_log/{v:020d}.json", "w") as fh:
        fh.write("\n".join(_json.dumps(a) for a in actions) + "\n")
    q = (spark.readStream.format("tulflow_delta_changes")
         .option("path", t).option("startingVersion", "-1").load()
         .writeStream.format("memory").queryName("nf")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from nf").collect()
    assert sorted(r["id"] for r in rows) == list(range(4))
    assert all(r["extra"] is None for r in rows)


def test_iceberg_stream_binds_by_field_id(spark, tmp_path):
    """r12: the Iceberg stream resolves columns by footer FIELD ID —
    a renamed current schema still streams correctly over old-name
    files, and an added column null-fills."""
    import json as _json

    from tulflow_spark.ext.iceberg import write_iceberg_fixture
    from tulflow_spark.sources.lake_stream import IcebergChangesSource

    spark.dataSource.register(IcebergChangesSource)
    t = str(tmp_path / "tbl")
    write_iceberg_fixture(spark, _df(spark, 0, 6), t)
    # rename id -> doc_id and ADD a column in the current schema
    mdir = f"{t}/metadata"
    meta = _json.load(open(f"{mdir}/v1.metadata.json"))
    cur = meta["schemas"][0]
    new_schema = _json.loads(_json.dumps(cur))
    new_schema["schema-id"] = 1
    new_schema["fields"][0]["name"] = "doc_id"
    new_schema["fields"].append(
        {"id": 9, "name": "extra", "required": False, "type": "long"})
    meta["schemas"].append(new_schema)
    meta["current-schema-id"] = 1
    _json.dump(meta, open(f"{mdir}/v1.metadata.json", "w"))
    q = (spark.readStream.format("tulflow_iceberg_changes")
         .option("path", t).option("startingSequence", "0").load()
         .writeStream.format("memory").queryName("ifid")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from ifid").collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(6))
    assert all(r["v"] == f"x{r['doc_id']}" and r["extra"] is None
               for r in rows)


def test_starting_timestamp_resolution(registered, tmp_path):
    """r13: startingTimestamp resolves to the EARLIEST commit at or
    after the timestamp (delta-spark semantics) through the same
    normalized commit-timestamp walk as batch time travel; after the
    latest commit it fails typed; combined with startingVersion it
    fails typed."""
    import json as _json

    spark = registered
    t = str(tmp_path / "tbl")
    write_delta(_df(spark, 0, 3), t)                          # v0
    write_delta(_df(spark, 3, 6), t, mode="append")           # v1
    write_delta(_df(spark, 6, 9), t, mode="append")           # v2
    for v, ts in ((0, 1000), (1, 2000), (2, 3000)):
        with open(f"{t}/_delta_log/{v:020d}.json", "a") as fh:
            fh.write("\n" + _json.dumps(
                {"commitInfo": {"timestamp": ts}}))

    def drain(ts):
        name = f"st_{ts}"
        q = (spark.readStream.format("tulflow_delta_changes")
             .option("path", t).option("startingTimestamp", str(ts))
             .load().writeStream.format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return sorted(r["id"] for r in
                      spark.sql(f"select * from {name}").collect())

    assert drain(1500) == list(range(3, 9))    # v1 (eff 2000) first
    assert drain(500) == list(range(9))        # before history: all
    assert drain(3000) == list(range(6, 9))    # exactly v2
    q = (spark.readStream.format("tulflow_delta_changes")
         .option("path", t).option("startingTimestamp", "99999")
         .load().writeStream.format("memory").queryName("st_late")
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="at or after"):
        q.awaitTermination(180)
    with pytest.raises(DeltaChangeFeedError, match="mutually"):
        DeltaChangesStreamReader(None, {
            "path": t, "startingversion": "0",
            "startingtimestamp": "1000"})


def test_iceberg_starting_timestamp(spark, tmp_path):
    """r13: the Iceberg source's startingTimestamp resolves to the
    earliest snapshot at or after it (snapshot timestamps), delivering
    from that sequence on."""
    import json as _json

    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        load_table_metadata,
        write_iceberg_fixture,
    )
    from tulflow_spark.sources.lake_stream import (
        IcebergChangesSource,
        IcebergChangesStreamReader,
    )

    spark.dataSource.register(IcebergChangesSource)
    t = str(tmp_path / "tbl")
    write_iceberg_fixture(spark, _df(spark, 0, 3), t)         # seq 1
    append_iceberg_fixture(spark, _df(spark, 3, 6), t)        # seq 2
    append_iceberg_fixture(spark, _df(spark, 6, 9), t)        # seq 3
    # pin snapshot timestamps deterministically
    hint = open(f"{t}/metadata/version-hint.text").read().strip()
    mp = f"{t}/metadata/v{hint}.metadata.json"
    meta = _json.loads(open(mp).read())
    for s, ts in zip(sorted(meta["snapshots"],
                            key=lambda x: x["sequence-number"]),
                     (1000, 2000, 3000)):
        s["timestamp-ms"] = ts
    for e, ts in zip(meta.get("snapshot-log") or [],
                     (1000, 2000, 3000)):
        e["timestamp-ms"] = ts
    with open(mp, "w") as fh:
        fh.write(_json.dumps(meta))

    def drain(ts):
        name = f"ist_{ts}"
        q = (spark.readStream.format("tulflow_iceberg_changes")
             .option("path", t).option("startingTimestamp", str(ts))
             .load().writeStream.format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return sorted(r["id"] for r in
                      spark.sql(f"select * from {name}").collect())

    assert drain(1500) == list(range(3, 9))
    assert drain(500) == list(range(9))
    q = (spark.readStream.format("tulflow_iceberg_changes")
         .option("path", t).option("startingTimestamp", "99999")
         .load().writeStream.format("memory").queryName("ist_late")
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="at or after"):
        q.awaitTermination(180)
    with pytest.raises(DeltaChangeFeedError, match="mutually"):
        IcebergChangesStreamReader(None, {
            "path": t, "startingsequence": "0",
            "startingtimestamp": "1000"})
