"""sources/lake_stream.py: the ``tulflow_iceberg_cdf`` streaming
source — Iceberg row-level changes (appends, whole-file removals,
position-delete/DV diffs in BOTH directions) delivered through
Structured Streaming with exactly-once offsets, matching the batch
`read_iceberg_cdf` content; equality deletes fail the batch typed."""

from __future__ import annotations

import pytest

from tulflow_spark.ext.iceberg import (
    append_iceberg_fixture,
    delete_where_iceberg,
    load_table_metadata,
    merge_iceberg,
    read_iceberg_cdf,
    restore_iceberg,
    rewrite_iceberg_data_files,
    upgrade_iceberg_v3,
    write_iceberg_fixture,
)
from tulflow_spark.sources.lake_stream import IcebergCdfSource


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)],
        "id long, v string").coalesce(1).sortWithinPartitions("id")


def _rows(it):
    return sorted((r["_commit_seq"], r["_change_type"], r["id"],
                   r["v"]) for r in it)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(IcebergCdfSource)
    return spark


def _drain(spark, path, ckpt=None, out=None, **opts):
    reader = (spark.readStream.format("tulflow_iceberg_cdf")
              .option("path", path).option("startingSequence", "0"))
    for k, val in opts.items():
        reader = reader.option(k, val)
    if ckpt:
        q = (reader.load().writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(180)
        try:
            return _rows(spark.read.parquet(out).collect())
        except Exception:
            return []
    import uuid

    name = f"ice_cdf_{uuid.uuid4().hex[:8]}"
    q = (reader.load().writeStream.format("memory")
         .queryName(name).outputMode("append")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    return _rows(spark.sql(f"SELECT * FROM {name}").collect())


def test_iceberg_cdf_stream_matches_batch(registered, tmp_path):
    """Appends, a position delete, and a restore (resurrection)
    stream exactly the batch changelog's content."""
    spark = registered
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 6), t)         # seq 1
    s1 = load_table_metadata(t)["current-snapshot-id"]
    append_iceberg_fixture(spark, _df(spark, 6, 9), t)        # seq 2
    delete_where_iceberg(spark, t, "id in (1, 3, 7)")         # seq 3
    restore_iceberg(t, s1)                                    # seq 4
    got = _drain(spark, t)
    want = sorted(
        (r["_commit_seq"], r["_change_type"], r["id"], r["v"])
        for r in read_iceberg_cdf(spark, t).collect())
    assert got == want
    # spot-check the restore wave: the appended file's SURVIVORS
    # unwind (7 already died at seq 3 — no double delivery) and the
    # position-deleted seed rows resurrect
    last = [x for x in got if x[0] == 4]
    assert sorted(x[1:3] for x in last) == sorted(
        [("delete", 6), ("delete", 8),
         ("insert", 1), ("insert", 3)])


def test_iceberg_cdf_stream_exactly_once_restart(registered,
                                                 tmp_path):
    """Changes committed between two drains arrive exactly once
    across a checkpoint restart."""
    spark = registered
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    write_iceberg_fixture(spark, _df(spark, 0, 4), t)         # seq 1
    first = _drain(spark, t, ckpt=ckpt, out=out)
    assert [x[:3] for x in first] == [
        (1, "insert", i) for i in range(4)]
    delete_where_iceberg(spark, t, "id = 2")                  # seq 2
    append_iceberg_fixture(spark, _df(spark, 4, 6), t)        # seq 3
    second = _drain(spark, t, ckpt=ckpt, out=out)
    assert sorted(x[:3] for x in second) == sorted(
        [(1, "insert", i) for i in range(4)]
        + [(2, "delete", 2)]
        + [(3, "insert", 4), (3, "insert", 5)])
    # a third drain with nothing new adds nothing
    assert _drain(spark, t, ckpt=ckpt, out=out) == second


def test_iceberg_cdf_stream_v3_dv_diff(registered, tmp_path):
    """v3 deletion-vector growth streams only the NEWLY-dead rows."""
    spark = registered
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 6), t)         # seq 1
    upgrade_iceberg_v3(t)
    delete_where_iceberg(spark, t, "id = 1")                  # seq 2
    delete_where_iceberg(spark, t, "id <= 2")                 # seq 3
    got = _drain(spark, t)
    assert [x[:3] for x in got if x[0] >= 2] == [
        (2, "delete", 1), (3, "delete", 0), (3, "delete", 2)]


def test_iceberg_cdf_stream_equality_deletes_over_threshold_fail_typed(
        registered, tmp_path):
    """Equality-delete debt ABOVE maxEqualityDeleteRows fails the
    batch typed (resolving victims would scan the un-compacted
    candidate set driver-side) — and after compaction pays the debt
    down, the stream resumes."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    spark = registered
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 4), t)         # seq 1
    merge_iceberg(spark, t, spark.createDataFrame(
        [(1, "B", "U")], "id long, v string, op string"),
        ["id"])                                               # seq 2
    with pytest.raises((StreamingQueryException, Py4JJavaError),
                       match="EQUALITY|equality"):
        q = (spark.readStream.format("tulflow_iceberg_cdf")
             .option("path", t).option("startingSequence", "0")
             .option("maxEqualityDeleteRows", "0")
             .load().writeStream.format("noop")
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        q.processAllAvailable()
    # compaction clears the debt; a stream from the rewrite onward
    # delivers the post-debt changes under the same zero threshold
    rewrite_iceberg_data_files(spark, t)                      # seq 3
    delete_where_iceberg(spark, t, "id = 0")                  # seq 4
    got = _drain(spark, t, startingSequence="3",
                 maxEqualityDeleteRows="0")
    assert [x[:3] for x in got] == [(4, "delete", 0)]


def test_iceberg_cdf_stream_merge_feed_matches_batch(registered,
                                                     tmp_path):
    """r15 (r14 VERDICT #2): merge_iceberg's OWN equality-delete
    output streams through tulflow_iceberg_cdf — the planner resolves
    victims to positions for small delete sets — and the full drained
    feed equals the batch changelog row for row, including an update
    that re-kills a key a prior merge already rewrote (overlapping
    victims) and a same-batch insert+delete."""
    spark = registered
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 6), t)         # seq 1
    merge_iceberg(spark, t, spark.createDataFrame(
        [(1, "B", "U"), (9, "n", "I")],
        "id long, v string, op string"), ["id"])              # seq 2
    merge_iceberg(spark, t, spark.createDataFrame(
        [(1, "C", "U"), (3, None, "D")],
        "id long, v string, op string"), ["id"])              # seq 3
    append_iceberg_fixture(spark, _df(spark, 20, 22), t)      # seq 4
    got = _drain(spark, t)
    want = _rows(read_iceberg_cdf(spark, t).collect())
    assert got == want
    # state sanity: inserts minus deletes net to the live table
    net: dict = {}
    for _, ct, i, v in got:
        net[(i, v)] = net.get((i, v), 0) + (1 if ct == "insert" else -1)
    from tulflow_spark.ext.iceberg import read_iceberg

    live = sorted((r["id"], r["v"])
                  for r in read_iceberg(spark, t).collect())
    assert sorted(k for k, n in net.items() if n) == live


def test_iceberg_cdf_stream_restore_across_merges_matches_batch(
        registered, tmp_path):
    """Departed equality deletes (restore_iceberg across two merges
    touching the same key) resurrect victims through the STREAM too —
    deduped by the position sets — matching the batch changelog."""
    spark = registered
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 4), t)         # seq 1
    s1 = load_table_metadata(t)["current-snapshot-id"]
    merge_iceberg(spark, t, spark.createDataFrame(
        [(1, "B", "U")], "id long, v string, op string"),
        ["id"])                                               # seq 2
    merge_iceberg(spark, t, spark.createDataFrame(
        [(1, "C", "U")], "id long, v string, op string"),
        ["id"])                                               # seq 3
    restore_iceberg(t, s1)                                    # seq 4
    got = _drain(spark, t)
    want = _rows(read_iceberg_cdf(spark, t).collect())
    assert got == want
    last = max(x[0] for x in got)
    assert [x for x in got if x[0] == last] == sorted([
        (last, "delete", 1, "C"), (last, "insert", 1, "x1")])


def test_iceberg_cdf_stream_partitioned_merge_scopes_eq_deletes(
        registered, tmp_path):
    """Partition-scoped candidate selection: a merge on a partitioned
    table writes GLOBAL equality deletes, and the stream's victim
    resolution must match the batch on every partition."""
    spark = registered
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"x{i}", i % 2) for i in range(6)],
        "id long, v string, g long").coalesce(1) \
        .sortWithinPartitions("id")
    write_iceberg_fixture(spark, df, t, partition_by=["g"])   # seq 1
    merge_iceberg(spark, t, spark.createDataFrame(
        [(0, "A", 0, "U"), (1, "B", 1, "U"), (9, "n", 1, "I")],
        "id long, v string, g long, op string"), ["id"])      # seq 2
    drained = _drain(spark, t)
    want = _rows(read_iceberg_cdf(spark, t).collect())
    assert drained == want


def test_iceberg_cdf_stream_admission_control(registered, tmp_path):
    """maxSequencesPerBatch caps each micro-batch; capped drains
    still deliver everything exactly once."""
    spark = registered
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    write_iceberg_fixture(spark, _df(spark, 0, 2), t)
    for lo in (2, 4, 6):
        append_iceberg_fixture(spark, _df(spark, lo, lo + 2), t)
    for _ in range(4):    # 4 capped drains cover 4 sequences
        got = _drain(spark, t, ckpt=ckpt, out=out,
                     maxSequencesPerBatch="1")
    assert [x[:3] for x in got] == sorted(
        (i // 2 + 1, "insert", i) for i in range(8))


def test_iceberg_cdf_apply_sink_end_to_end(registered, tmp_path):
    """The full Iceberg CDC loop: an upstream table maintained by
    position-delete writers streams through tulflow_iceberg_cdf into
    a downstream Iceberg table via iceberg_cdf_apply_sink
    (merge_iceberg per batch) — converging to the upstream state
    across restarts, replayed batches skipped by the snapshot-summary
    watermark."""
    from tulflow_spark.ext.iceberg import (
        iceberg_cdf_apply_sink,
        iceberg_txn_watermark,
        read_iceberg,
    )

    spark = registered
    up = str(tmp_path / "up")
    down = str(tmp_path / "down")
    ckpt = str(tmp_path / "ck")
    write_iceberg_fixture(spark, _df(spark, 0, 6), up)        # seq 1
    delete_where_iceberg(spark, up, "id in (1, 3)")           # seq 2

    def drain():
        q = (spark.readStream.format("tulflow_iceberg_cdf")
             .option("path", up).option("startingSequence", "0")
             .load().writeStream
             .foreachBatch(iceberg_cdf_apply_sink(
                 down, "loop-test", ["id"]))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(180)

    drain()
    assert sorted(r["id"] for r in
                  read_iceberg(spark, down).collect()) == [0, 2, 4, 5]
    # more upstream changes, then a second drain (restart)
    append_iceberg_fixture(spark, _df(spark, 6, 8), up)       # seq 3
    delete_where_iceberg(spark, up, "id = 0")                 # seq 4
    drain()
    upstream = sorted((r["id"], r["v"]) for r in
                      read_iceberg(spark, up).collect())
    downstream = sorted((r["id"], r["v"]) for r in
                        read_iceberg(spark, down).collect())
    assert upstream == downstream == [
        (2, "x2"), (4, "x4"), (5, "x5"), (6, "x6"), (7, "x7")]
    # watermark recorded; a replayed batch would skip
    wm = iceberg_txn_watermark(load_table_metadata(down), "loop-test")
    assert wm >= 0
    # idempotence: re-applying batch 0 content under an old batch id
    # is a no-op
    sink = iceberg_cdf_apply_sink(down, "loop-test", ["id"])
    batch = read_iceberg_cdf(spark, up)
    sink(batch, 0)
    assert sorted((r["id"], r["v"]) for r in
                  read_iceberg(spark, down).collect()) == downstream


def test_iceberg_apply_sink_consumes_delta_feed(registered,
                                                tmp_path):
    """Cross-format CDC: a DELTA change feed applies into an Iceberg
    target (the sink orders by _commit_version when _commit_seq is
    absent)."""
    from tulflow_spark.ext.delta_log import (
        merge_delta,
        write_delta,
    )
    from tulflow_spark.ext.iceberg import (
        iceberg_cdf_apply_sink,
        read_iceberg,
    )
    from tulflow_spark.sources.lake_stream import DeltaCdfSource

    spark = registered
    spark.dataSource.register(DeltaCdfSource)
    up = str(tmp_path / "dup")
    down = str(tmp_path / "ddown")
    ckpt = str(tmp_path / "dck")
    write_delta(
        spark.createDataFrame([(i, f"x{i}") for i in range(4)],
                              "id long, v string"),
        up, mode="append",
        configuration={"delta.enableChangeDataFeed": "true"})
    merge_delta(spark, up, spark.createDataFrame(
        [(1, "B", "U"), (9, "n", "I"), (2, None, "D")],
        "id long, v string, op string"), keys=["id"])
    q = (spark.readStream.format("tulflow_delta_cdf")
         .option("path", up).option("startingVersion", "-1")
         .load().writeStream
         .foreachBatch(iceberg_cdf_apply_sink(
             down, "xfmt", ["id"]))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    assert sorted((r["id"], r["v"]) for r in
                  read_iceberg(spark, down).collect()) == [
        (0, "x0"), (1, "B"), (3, "x3"), (9, "n")]


def test_iceberg_cdf_stream_ending_sequence_bound(registered,
                                                  tmp_path):
    """endingSequence bounds a backfill window: the stream delivers
    (start, end] and stays idle — later commits never arrive."""
    spark = registered
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    write_iceberg_fixture(spark, _df(spark, 0, 2), t)         # seq 1
    append_iceberg_fixture(spark, _df(spark, 2, 4), t)        # seq 2
    append_iceberg_fixture(spark, _df(spark, 4, 6), t)        # seq 3
    got = _drain(spark, t, ckpt=ckpt, out=out, endingSequence="2")
    assert [x[:3] for x in got] == sorted(
        (i // 2 + 1, "insert", i) for i in range(4))
    append_iceberg_fixture(spark, _df(spark, 6, 8), t)        # seq 4
    assert _drain(spark, t, ckpt=ckpt, out=out,
                  endingSequence="2") == got


def test_apply_sink_evolves_target_schema(registered, tmp_path):
    """evolve_schema=True on the apply sink: a feed carrying a column
    the target lacks widens the target in the applying commit — the
    end-to-end CDC schema-evolution story."""
    from tulflow_spark.ext.delta_log import (
        merge_delta,
        read_delta,
        write_delta,
    )
    from tulflow_spark.ext.delta_log import (
        delta_cdf_apply_sink,
    )
    from tulflow_spark.sources.lake_stream import DeltaCdfSource

    spark = registered
    spark.dataSource.register(DeltaCdfSource)
    up = str(tmp_path / "up")
    down = str(tmp_path / "down")
    ckpt = str(tmp_path / "ck")
    cdf = {"delta.enableChangeDataFeed": "true"}
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        up, mode="append", configuration=cdf)
    # seed the downstream at the ORIGINAL schema
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        down, mode="append")
    # upstream evolves: a merge carries a new column
    merge_delta(spark, up, spark.createDataFrame(
        [(2, "B", 7, "U"), (3, "c", 9, "I")],
        "id long, v string, w long, op string"),
        keys=["id"], evolve_schema=True)
    # the stream (started AFTER the evolution) carries w; the sink
    # widens the downstream in the applying commit
    q = (spark.readStream.format("tulflow_delta_cdf")
         .option("path", up).option("startingVersion", "0")
         .load().writeStream
         .foreachBatch(delta_cdf_apply_sink(
             down, "evo", ["id"], evolve_schema=True))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    got = sorted((r["id"], r["v"], r["w"])
                 for r in read_delta(spark, down).collect())
    assert got == [(1, "a", None), (2, "B", 7), (3, "c", 9)]


def test_branch_snapshot_cannot_mask_expired_gap(registered, tmp_path):
    """r14 advice: the sequence-completeness check must run on the
    MAIN-lineage snapshots — a side-branch snapshot filling a sequence
    gap must not mask an expired main-lineage snapshot (pre-fix the
    stream silently delivered only the head and lost the gap's rows)."""
    import json

    from tulflow_spark.sources.lake_stream import (
        DeltaChangeFeedError,
        IcebergCdfStreamReader,
    )

    spark = registered
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 2), t)         # seq 1
    append_iceberg_fixture(spark, _df(spark, 2, 4), t)        # seq 2
    append_iceberg_fixture(spark, _df(spark, 4, 6), t)        # seq 3
    hint = open(f"{t}/metadata/version-hint.text").read().strip()
    mp = f"{t}/metadata/v{hint}.metadata.json"
    m = json.loads(open(mp).read())
    s1, s2, s3 = sorted(m["snapshots"],
                        key=lambda s: s["sequence-number"])
    # simulate snapshot expiry of s2 with a branch snapshot left at
    # the SAME sequence number (parented off s1, reachable only via a
    # branch ref)
    branch = dict(s2)
    branch["snapshot-id"] = 424242
    branch["parent-snapshot-id"] = s1["snapshot-id"]
    m["snapshots"] = [s1, branch, s3]
    m.setdefault("refs", {})["dev"] = {
        "snapshot-id": 424242, "type": "branch"}
    with open(mp, "w") as fh:
        fh.write(json.dumps(m))
    reader = IcebergCdfStreamReader(None, {"path": t,
                                           "startingSequence": "0"})
    with pytest.raises(DeltaChangeFeedError, match="missing expired"):
        reader.partitions({"seq": 0}, {"seq": 3})


def test_branch_ahead_of_parentless_head_never_delivers(
        registered, tmp_path):
    """r14 advice: a parentless head is a single-node lineage, not 'no
    filter' — and offsets follow the MAIN branch, so a branch ref ahead
    of main must not pull branch-only sequences into the range."""
    import json

    from tulflow_spark.sources.lake_stream import IcebergCdfStreamReader

    spark = registered
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 3), t)         # seq 1
    hint = open(f"{t}/metadata/version-hint.text").read().strip()
    mp = f"{t}/metadata/v{hint}.metadata.json"
    m = json.loads(open(mp).read())
    (s1,) = m["snapshots"]
    assert s1.get("parent-snapshot-id") is None
    branch = dict(s1)
    branch["snapshot-id"] = 424242
    branch["sequence-number"] = s1["sequence-number"] + 1
    branch["parent-snapshot-id"] = s1["snapshot-id"]
    m["snapshots"] = [s1, branch]
    m.setdefault("refs", {})["dev"] = {
        "snapshot-id": 424242, "type": "branch"}
    with open(mp, "w") as fh:
        fh.write(json.dumps(m))
    reader = IcebergCdfStreamReader(None, {"path": t,
                                           "startingSequence": "0"})
    # offsets stop at the main head's sequence, not the branch's
    assert reader.latestOffset() == {"seq": s1["sequence-number"]}
    # and the full stream delivers exactly the main-lineage rows
    got = _drain(spark, t)
    assert [x[:3] for x in got] == [(1, "insert", 0), (1, "insert", 1),
                                    (1, "insert", 2)]


def test_apply_sink_all_delete_first_batch_seeds_without_data_file(
        registered, tmp_path):
    """r14 advice: seeding a missing target from an all-delete first
    batch must commit an empty-manifest snapshot carrying the txn
    watermark — not stage a zero-row data file whose manifest entry
    taxes every future read."""
    from tulflow_spark.ext.iceberg import (
        _live_files,
        iceberg_cdf_apply_sink,
        iceberg_txn_watermark,
        read_iceberg,
    )

    spark = registered
    down = str(tmp_path / "down")
    sink = iceberg_cdf_apply_sink(down, "seed-test", ["id"])
    batch0 = spark.createDataFrame(
        [(1, "a", "delete", 1, 11)],
        "id long, v string, _change_type string, _commit_seq long, "
        "_snapshot_id long")
    sink(batch0, 0)
    meta = load_table_metadata(down)
    # watermark recorded, zero data files referenced, zero rows
    assert iceberg_txn_watermark(meta, "seed-test") == 0
    data_files, _ = _live_files(meta, None)
    assert data_files == []
    assert read_iceberg(spark, down).collect() == []
    # a replay of batch 0 skips; the next batch merges normally
    sink(batch0, 0)
    assert len(load_table_metadata(down)["snapshots"]) == 1
    batch1 = spark.createDataFrame(
        [(2, "b", "insert", 2, 22), (1, "a2", "insert", 2, 22)],
        "id long, v string, _change_type string, _commit_seq long, "
        "_snapshot_id long")
    sink(batch1, 1)
    assert sorted((r["id"], r["v"]) for r in
                  read_iceberg(spark, down).collect()) == [
        (1, "a2"), (2, "b")]


def test_apply_sink_delete_debt_policy_bounds_read_amp(registered,
                                                       tmp_path):
    """r15 (r14 VERDICT #8): each applied batch is one blind merge
    (one equality-delete file + one data file), so an un-maintained
    target's merge-on-read debt grows linearly in batch count.  The
    armed policy (compact_after_files) keeps the live delete-file
    count — what every reader pays an anti-join per — bounded by the
    threshold across N micro-batches, and the maintained target stays
    byte-identical in content to the un-maintained one."""
    from tulflow_spark.ext.iceberg import (
        iceberg_cdf_apply_sink,
        iceberg_delete_debt,
        read_iceberg,
    )

    spark = registered
    plain = str(tmp_path / "plain")
    policy = str(tmp_path / "policy")
    sink_plain = iceberg_cdf_apply_sink(plain, "debt-a", ["id"])
    sink_policy = iceberg_cdf_apply_sink(
        policy, "debt-b", ["id"], compact_after_files=3)

    def batch(rows, seq):
        return spark.createDataFrame(
            [(i, v, ct, seq) for (i, v, ct) in rows],
            "id long, v string, _change_type string, _commit_seq long")

    batches = [[(i, f"x{i}", "insert") for i in range(8)]]   # seeds
    for b in range(1, 9):
        batches.append([
            (b % 8, f"u{b}", "update_postimage"),
            ((b + 3) % 8, f"w{b}", "update_postimage"),
            (100 + b, f"n{b}", "insert"),
            (100 + b - 1, "", "delete"),     # kills last batch's insert
        ])
    debt_plain, debt_policy = [], []
    for bid, rows in enumerate(batches):
        df = batch(rows, bid)
        sink_plain(df, bid)
        sink_policy(df, bid)
        debt_plain.append(iceberg_delete_debt(plain)["delete_files"])
        debt_policy.append(iceberg_delete_debt(policy)["delete_files"])
    # un-maintained: one equality-delete file per post-seed batch
    assert debt_plain[-1] >= 8
    # armed: observed debt never exceeds the threshold, and the
    # trigger actually fired (debt returned to zero at least once)
    assert max(debt_policy) <= 3
    assert 0 in debt_policy[1:]
    # maintenance is invisible to content: both targets converge
    got_plain = sorted((r["id"], r["v"]) for r in
                       read_iceberg(spark, plain).collect())
    got_policy = sorted((r["id"], r["v"]) for r in
                        read_iceberg(spark, policy).collect())
    assert got_plain == got_policy
    assert (108, "n8") in got_policy and (107, "") not in got_policy
    # the metric itself is coherent on the un-maintained table
    debt = iceberg_delete_debt(plain)
    assert debt["delete_rows"] > 0 and debt["data_rows"] > 0
    assert debt["ratio"] == pytest.approx(
        debt["delete_rows"] / debt["data_rows"])


def test_maintained_target_streams_onward(registered, tmp_path):
    """Maintenance composes with the CDC relay: a mid table fed by an
    apply sink with the convert-mode debt policy (replace snapshots
    interleaved with the merges) must still serve a REAL downstream
    changelog stream — the conversion snapshots are invisible (row-
    preserving replace), the merge snapshots' eq deletes resolve
    through the streaming eq path, and nothing double-delivers."""
    from tulflow_spark.ext.iceberg import (
        iceberg_cdf_apply_sink,
        iceberg_delete_debt,
        read_iceberg,
    )

    spark = registered
    mid = str(tmp_path / "mid")
    down = str(tmp_path / "down")
    ckpt = str(tmp_path / "ck")
    sink = iceberg_cdf_apply_sink(mid, "relay", ["id"],
                                  compact_after_files=2,
                                  compact_mode="convert")

    def batch(rows, seq):
        return spark.createDataFrame(
            [(i, v, ct, seq) for (i, v, ct) in rows],
            "id long, v string, _change_type string, _commit_seq long"
        ).coalesce(1)

    sink(batch([(i, f"x{i}", "insert") for i in range(6)], 0), 0)
    for b in range(1, 5):
        sink(batch([(b, f"u{b}", "update_postimage"),
                    (10 + b, f"n{b}", "insert"),
                    (5, "", "delete") if b == 3
                    else (20 + b, f"m{b}", "insert")], b), b)
    # the policy actually fired: eq debt bounded, replace present
    assert iceberg_delete_debt(mid)["eq_delete_files"] <= 2
    assert any((s.get("summary") or {}).get("operation") == "replace"
               for s in load_table_metadata(mid)["snapshots"])
    q = (spark.readStream.format("tulflow_iceberg_cdf")
         .option("path", mid).option("startingSequence", "0").load()
         .writeStream.foreachBatch(iceberg_cdf_apply_sink(
             down, "onward", ["id"]))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    got_mid = sorted((r["id"], r["v"]) for r in
                     read_iceberg(spark, mid).collect())
    got_down = sorted((r["id"], r["v"]) for r in
                      read_iceberg(spark, down).collect())
    assert got_mid == got_down
    assert (5, "x5") not in got_down and (1, "u1") in got_down
