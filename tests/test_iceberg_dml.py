"""Iceberg row-level DML writer verbs (`ext/iceberg.py`):
merge_iceberg (the Flink-CDC equality-delete upsert shape, cf.
reference harvest.py:196-203 for the downstream deleted-record
consumer), delete_where_iceberg / update_where_iceberg (merge-on-read
position deletes), and restore_iceberg (metadata-only rollback) —
each commit resolvable exactly by read_iceberg_cdf."""

from __future__ import annotations

import pytest

from tulflow_spark.ext.iceberg import (
    IcebergConcurrentCommit,
    IcebergError,
    _live_files,
    delete_where_iceberg,
    expire_iceberg_snapshots,
    iceberg_snapshots,
    load_table_metadata,
    merge_iceberg,
    read_iceberg,
    read_iceberg_cdf,
    restore_iceberg,
    rewrite_iceberg_data_files,
    update_where_iceberg,
    upgrade_iceberg_v3,
    write_iceberg_fixture,
)


def _df(spark, rows, ddl="id long, v string"):
    return spark.createDataFrame(rows, ddl).coalesce(1) \
        .sortWithinPartitions("id")


def _chg(spark, rows):
    return spark.createDataFrame(rows, "id long, v string, op string")


def _state(spark, t):
    return sorted((r["id"], r["v"])
                  for r in read_iceberg(spark, t).collect())


def _feed(df):
    return sorted((r["_commit_seq"], r["_change_type"], r["id"],
                   r["v"]) for r in df.collect())


def _sid_of_seq(t, seq):
    return next(s["snapshot_id"] for s in iceberg_snapshots(t)
                if s["sequence_number"] == seq)


def test_merge_basic_state_and_changelog(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark, _df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)  # seq 1
    sid = merge_iceberg(spark, t, _chg(spark, [
        (2, "B", "U"),          # update existing
        (4, "d", "I"),          # insert new
        (3, None, "D"),         # delete existing
        (9, None, "D"),         # delete missing → no-op
        (5, "e", "U"),          # upsert on missing key → insert
    ]), keys=["id"])
    assert sid == load_table_metadata(t)["current-snapshot-id"]
    assert _state(spark, t) == [(1, "a"), (2, "B"), (4, "d"), (5, "e")]
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[0] == 2] == sorted([
        (2, "delete", 2, "b"),
        (2, "delete", 3, "c"),
        (2, "insert", 2, "B"),
        (2, "insert", 4, "d"),
        (2, "insert", 5, "e"),
    ])
    # net-consistency
    ins = {(i, v) for _, c, i, v in got if c == "insert"}
    dels = {(i, v) for _, c, i, v in got if c == "delete"}
    assert sorted(ins - dels) == _state(spark, t)
    # operation recorded as overwrite (mixed delete+insert)
    snaps = load_table_metadata(t)["snapshots"]
    assert next(s for s in snaps if s["snapshot-id"] == sid)[
        "summary"]["operation"] == "overwrite"


def test_merge_pure_insert_and_pure_delete_ops(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, [(1, "a"), (2, "b")]), t)
    s2 = merge_iceberg(spark, t, _chg(spark, [(3, "c", "I")]), ["id"])
    s3 = merge_iceberg(spark, t, _chg(spark, [(1, None, "D")]), ["id"])
    assert _state(spark, t) == [(2, "b"), (3, "c")]
    ops = {s["snapshot-id"]: s["summary"]["operation"]
           for s in load_table_metadata(t)["snapshots"]}
    assert ops[s2] == "append" and ops[s3] == "delete"
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[0] >= 2] == [
        (2, "insert", 3, "c"), (3, "delete", 1, "a")]


def test_merge_sequence_strict_across_merges(spark, tmp_path):
    """A second merge's equality delete must not hide rows the FIRST
    merge inserted at a lower sequence — and must hide its own
    predecessors."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, [(1, "a")]), t)
    merge_iceberg(spark, t, _chg(spark, [(1, "b", "U")]), ["id"])
    merge_iceberg(spark, t, _chg(spark, [(1, "c", "U")]), ["id"])
    assert _state(spark, t) == [(1, "c")]
    got = _feed(read_iceberg_cdf(spark, t))
    assert got == [
        (1, "insert", 1, "a"),
        (2, "delete", 1, "a"), (2, "insert", 1, "b"),
        (3, "delete", 1, "b"), (3, "insert", 1, "c"),
    ]


def test_merge_partitioned_table(spark, tmp_path):
    """Data files keep identity partitioning; the equality delete is
    GLOBAL (empty partition record in its own manifest schema) and
    still hides rows in every partition."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark,
        _df(spark, [(1, "a", 0), (2, "b", 0), (3, "c", 1)],
            "id long, v string, g long"),
        t, partition_by=["g"])
    sid = merge_iceberg(spark, t, spark.createDataFrame(
        [(2, "B", 0, "U"), (3, None, None, "D"), (4, "d", 1, "I")],
        "id long, v string, g long, op string"), keys=["id"])
    assert sorted((r["id"], r["v"], r["g"])
                  for r in read_iceberg(spark, t).collect()) == [
        (1, "a", 0), (2, "B", 0), (4, "d", 1)]
    # the new data files carry partition values; the delete is global
    meta = load_table_metadata(t)
    dfs, dls = _live_files(meta, sid)
    added = [d for d in dfs if int(d["__seq"]) == 2]
    assert {tuple(sorted((d.get("partition") or {}).items()))
            for d in added} == {(("g", 0),), (("g", 1),)}
    assert all((d.get("partition") or {}) == {} for d in dls)
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[0] == 2] == sorted([
        (2, "delete", 2, "b"), (2, "delete", 3, "c"),
        (2, "insert", 2, "B"), (2, "insert", 4, "d")])


def test_global_delete_manifest_gets_unpartitioned_spec(spark,
                                                        tmp_path):
    """r14 advice: on a PARTITIONED table, the global (empty-partition)
    delete manifests that merge/update write must reference a spec
    whose partition type matches their empty payload — a registered
    unpartitioned spec, not the table's partitioned spec 0, which a
    conformant external reader would use to decode (and mis-scope)
    them.  Data manifests keep the writing spec."""
    from tulflow_spark.ext.iceberg import _read_bytes, read_ocf

    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark,
        _df(spark, [(1, "a", 0), (2, "b", 0), (3, "c", 1)],
            "id long, v string, g long"),
        t, partition_by=["g"])
    sid = merge_iceberg(spark, t, spark.createDataFrame(
        [(2, "B", 0, "U")], "id long, v string, g long, op string"),
        keys=["id"])
    meta = load_table_metadata(t)
    specs = {int(s["spec-id"]): s.get("fields") or []
             for s in meta["partition-specs"]}
    default_id = int(meta.get("default-spec-id") or 0)
    assert specs[default_id], "writing spec should stay partitioned"
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    entries = read_ocf(_read_bytes(snap["manifest-list"]))
    dele = [e for e in entries if int(e.get("content") or 0) == 1]
    data = [e for e in entries if int(e.get("content") or 0) == 0]
    assert dele and data
    for e in dele:
        assert specs[int(e["partition_spec_id"])] == []
    for e in data:
        assert int(e["partition_spec_id"]) == default_id
    # a second merge REUSES the registered empty spec; the table
    # still reads and diffs correctly through the changelog
    merge_iceberg(spark, t, spark.createDataFrame(
        [(1, "A", 0, "U")], "id long, v string, g long, op string"),
        keys=["id"])
    meta2 = load_table_metadata(t)
    assert len([s for s in meta2["partition-specs"]
                if not (s.get("fields") or [])]) == 1
    assert sorted((r["id"], r["v"]) for r in
                  read_iceberg(spark, t).collect()) == [
        (1, "A"), (2, "B"), (3, "c")]


def test_unpartitioned_table_registers_no_extra_spec(spark, tmp_path):
    """An unpartitioned table's global deletes already match spec 0 —
    no extra spec must appear."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, [(1, "a"), (2, "b")]), t)
    merge_iceberg(spark, t, _chg(spark, [(1, "A", "U")]), ["id"])
    rewrite_iceberg_data_files(spark, t)    # pay the eq-delete debt
    update_where_iceberg(spark, t, "id = 2", {"v": "'B'"})
    meta = load_table_metadata(t)
    assert len(meta["partition-specs"]) == 1
    assert _state(spark, t) == [(1, "A"), (2, "B")]


def test_merge_on_v3_table(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, [(1, "a"), (2, "b")]), t)
    upgrade_iceberg_v3(t)
    merge_iceberg(spark, t, _chg(spark, [(1, "A", "U")]), ["id"])
    assert _state(spark, t) == [(1, "A"), (2, "b")]


def test_merge_validation_walls(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, [(1, "a")]), t)
    cur = load_table_metadata(t)["current-snapshot-id"]
    with pytest.raises(IcebergError, match="missing columns"):
        merge_iceberg(spark, t, spark.createDataFrame(
            [(1, "U")], "id long, op string"), ["id"])
    with pytest.raises(IcebergError, match="merge keys"):
        merge_iceberg(spark, t, _chg(spark, [(1, "a", "U")]), ["nope"])
    with pytest.raises(IcebergError, match="one of I/U/D"):
        merge_iceberg(spark, t, _chg(spark, [(1, "a", "X")]), ["id"])
    with pytest.raises(IcebergError, match="NULL merge keys"):
        merge_iceberg(spark, t,
                      _chg(spark, [(None, "a", "U")]), ["id"])
    with pytest.raises(IcebergError, match="duplicate keys"):
        merge_iceberg(spark, t, _chg(
            spark, [(1, "a", "U"), (1, "b", "D")]), ["id"])
    with pytest.raises(IcebergError, match="types differ"):
        merge_iceberg(spark, t, spark.createDataFrame(
            [(1, 2, "U")], "id long, v long, op string"), ["id"])
    with pytest.raises(IcebergError, match="collides"):
        merge_iceberg(spark, t, _chg(spark, [(1, "a", "U")]), ["id"],
                      op_col="v")
    with pytest.raises(IcebergConcurrentCommit, match="re-read"):
        merge_iceberg(spark, t, _chg(spark, [(1, "a", "U")]), ["id"],
                      expect_snapshot_id=12345)
    # empty change set → no-op, current id back
    assert merge_iceberg(
        spark, t, _chg(spark, []), ["id"]) == cur
    assert load_table_metadata(t)["current-snapshot-id"] == cur


def test_delete_where_position_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark, _df(spark, [(i, f"x{i}") for i in range(6)]), t)
    cur = load_table_metadata(t)["current-snapshot-id"]
    sid = delete_where_iceberg(spark, t, "id in (1, 4)")
    assert sid != cur
    assert _state(spark, t) == [
        (0, "x0"), (2, "x2"), (3, "x3"), (5, "x5")]
    # no data files rewritten — only a content=1 delete file appears
    dfs, dls = _live_files(load_table_metadata(t), None)
    assert all(int(d["__seq"]) == 1 for d in dfs)
    assert [int(d["content"]) for d in dls] == [1]
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[0] == 2] == [
        (2, "delete", 1, "x1"), (2, "delete", 4, "x4")]
    # second delete: already-dead rows never re-deliver
    delete_where_iceberg(spark, t, "id <= 2")
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[0] == 3] == [
        (3, "delete", 0, "x0"), (3, "delete", 2, "x2")]
    # no match → no-op
    assert delete_where_iceberg(spark, t, "id = 999") == \
        load_table_metadata(t)["current-snapshot-id"]


def test_delete_where_v3_routes_to_dv(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark, _df(spark, [(i, f"x{i}") for i in range(5)]), t)
    upgrade_iceberg_v3(t)
    delete_where_iceberg(spark, t, "id = 2")
    assert sorted(r["id"] for r in read_iceberg(spark, t).collect()) \
        == [0, 1, 3, 4]
    _, dls = _live_files(load_table_metadata(t), None)
    assert all(str(d["file_format"]).upper() == "PUFFIN" for d in dls)
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[1] == "delete"] == [
        (2, "delete", 2, "x2")]


def test_delete_where_walls(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, [(1, "a"), (2, "b")]), t)
    merge_iceberg(spark, t, _chg(spark, [(1, "A", "U")]), ["id"])
    with pytest.raises(IcebergError, match="equality deletes"):
        delete_where_iceberg(spark, t, "id = 2")
    with pytest.raises(IcebergError, match="equality deletes"):
        update_where_iceberg(spark, t, "id = 2", {"v": "'x'"})
    # rewrite pays the debt down, then the verbs work
    rewrite_iceberg_data_files(spark, t)
    delete_where_iceberg(spark, t, "id = 2")
    assert _state(spark, t) == [(1, "A")]
    t2 = str(tmp_path / "orc")
    write_iceberg_fixture(spark, _df(spark, [(1, "a")]), t2,
                          file_format="orc")
    with pytest.raises(IcebergError, match="ORC|parquet"):
        delete_where_iceberg(spark, t2, "id = 1")


def test_update_where_one_snapshot_and_feed(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark, _df(spark, [(i, f"x{i}") for i in range(4)]), t)
    sid = update_where_iceberg(spark, t, "id >= 2",
                               {"v": "concat(v, '!')"})
    assert _state(spark, t) == [
        (0, "x0"), (1, "x1"), (2, "x2!"), (3, "x3!")]
    # ONE snapshot committed both the position delete and the data
    snaps = load_table_metadata(t)["snapshots"]
    assert len(snaps) == 2
    assert next(s for s in snaps if s["snapshot-id"] == sid)[
        "summary"]["operation"] == "overwrite"
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[0] == 2] == sorted([
        (2, "delete", 2, "x2"), (2, "delete", 3, "x3"),
        (2, "insert", 2, "x2!"), (2, "insert", 3, "x3!")])
    # SET sees the PRE-update row; casts to the declared type
    update_where_iceberg(spark, t, "id = 0",
                         {"id": "id + 10", "v": "cast(id as string)"})
    assert (10, "0") in _state(spark, t)
    # walls
    with pytest.raises(IcebergError, match="set_exprs"):
        update_where_iceberg(spark, t, "id = 1", {})
    with pytest.raises(IcebergError, match="unknown columns"):
        update_where_iceberg(spark, t, "id = 1", {"nope": "'x'"})
    # no match → no-op
    cur = load_table_metadata(t)["current-snapshot-id"]
    assert update_where_iceberg(spark, t, "id = 999",
                                {"v": "'x'"}) == cur


def test_update_where_v3_one_snapshot(spark, tmp_path):
    """r14 VERDICT #6 (the last v3 DML asymmetry): UPDATE on a v3
    table commits the deletion vector AND the updated data files in
    ONE atomic snapshot, resolvable by the changelog, with the DV
    never hiding the same-sequence new rows."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark, _df(spark, [(i, f"x{i}") for i in range(4)]), t)
    upgrade_iceberg_v3(t)
    sid = update_where_iceberg(spark, t, "id >= 2",
                               {"v": "concat(v, '!')"})
    assert _state(spark, t) == [
        (0, "x0"), (1, "x1"), (2, "x2!"), (3, "x3!")]
    snaps = load_table_metadata(t)["snapshots"]
    assert len(snaps) == 2
    assert next(s for s in snaps if s["snapshot-id"] == sid)[
        "summary"]["operation"] == "overwrite"
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[0] == 2] == sorted([
        (2, "delete", 2, "x2"), (2, "delete", 3, "x3"),
        (2, "insert", 2, "x2!"), (2, "insert", 3, "x3!")])
    # a second v3 update touching an ALREADY-DV'd file merges the
    # prior vector (one live DV per file) and stays readable
    update_where_iceberg(spark, t, "id = 1", {"v": "'y'"})
    assert _state(spark, t) == [
        (0, "x0"), (1, "y"), (2, "x2!"), (3, "x3!")]
    dels = _live_files(load_table_metadata(t), None)[1]
    dv_per_file: dict = {}
    for d in dels:
        assert str(d.get("file_format")).upper() == "PUFFIN"
        ref = str(d["referenced_data_file"])
        dv_per_file[ref] = dv_per_file.get(ref, 0) + 1
    assert dv_per_file and all(n == 1 for n in dv_per_file.values())
    # no match → no-op, and empty set_exprs still walls
    cur = load_table_metadata(t)["current-snapshot-id"]
    assert update_where_iceberg(spark, t, "id = 999",
                                {"v": "'x'"}) == cur
    with pytest.raises(IcebergError, match="set_exprs"):
        update_where_iceberg(spark, t, "id = 1", {})


def test_restore_state_equals_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark, _df(spark, [(i, f"x{i}") for i in range(4)]), t)  # s1
    s1 = load_table_metadata(t)["current-snapshot-id"]
    merge_iceberg(spark, t, _chg(spark, [
        (1, "B", "U"), (9, "n", "I")]), ["id"])                 # s2
    sid = restore_iceberg(t, s1)
    assert sid == load_table_metadata(t)["current-snapshot-id"]
    assert _state(spark, t) == sorted(
        (r["id"], r["v"]) for r in read_iceberg(
            spark, t, snapshot_id=s1).collect())
    assert _state(spark, t) == [(i, f"x{i}") for i in range(4)]
    # restoring to the present is a no-op
    assert restore_iceberg(t, sid) == sid
    # feed across the rollback delivers the inverse of the merge
    got = _feed(read_iceberg_cdf(spark, t))
    last = max(x[0] for x in got)
    assert [x for x in got if x[0] == last] == sorted([
        (last, "delete", 1, "B"), (last, "delete", 9, "n"),
        (last, "insert", 1, "x1")])


def test_restore_resurrects_position_deleted_rows(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark, _df(spark, [(i, f"x{i}") for i in range(5)]), t)  # s1
    s1 = load_table_metadata(t)["current-snapshot-id"]
    delete_where_iceberg(spark, t, "id in (1, 3)")               # s2
    s2 = load_table_metadata(t)["current-snapshot-id"]
    sid = restore_iceberg(t, s1)                                 # s3
    assert sorted(r["id"] for r in read_iceberg(spark, t).collect()) \
        == list(range(5))
    tail = _feed(read_iceberg_cdf(spark, t, from_snapshot_id=s2))
    assert tail == [(3, "insert", 1, "x1"), (3, "insert", 3, "x3")]
    # restore of a restore: roll forward again
    restore_iceberg(t, s2)
    assert sorted(r["id"] for r in read_iceberg(spark, t).collect()) \
        == [0, 2, 4]
    assert sid  # silence linters


def test_restore_across_overlapping_merges_dedupes_resurrection(
        spark, tmp_path):
    """restore_iceberg across TWO merge_iceberg commits that updated
    the SAME key drops two equality-delete files with overlapping
    victims — the resurrected base row must appear exactly ONCE in the
    changelog (r14 advice: the per-delete loop delivered it once per
    departed delete file)."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark, _df(spark, [(1, "a"), (2, "b")]), t)             # s1
    s1 = load_table_metadata(t)["current-snapshot-id"]
    merge_iceberg(spark, t, _chg(spark, [(1, "B", "U")]), ["id"])
    merge_iceberg(spark, t, _chg(spark, [(1, "C", "U")]), ["id"])
    s3 = load_table_metadata(t)["current-snapshot-id"]
    restore_iceberg(t, s1)                                       # s4
    assert _state(spark, t) == [(1, "a"), (2, "b")]
    tail = _feed(read_iceberg_cdf(spark, t, from_snapshot_id=s3))
    last = max(x[0] for x in tail)
    # delete of the final merged value (the intermediate (1,"B") was
    # already dead pre-restore), ONE resurrected insert — no duplicate
    assert tail == sorted([
        (last, "delete", 1, "C"), (last, "insert", 1, "a")])
    # the whole feed still nets to the table state
    full = _feed(read_iceberg_cdf(spark, t))
    net: dict = {}
    for _, c, i, v in full:
        if c == "insert":
            net[(i, v)] = net.get((i, v), 0) + 1
        else:
            net[(i, v)] = net.get((i, v), 0) - 1
    assert sorted(k for k, n in net.items() if n) == \
        [(1, "a"), (2, "b")]


def test_restore_across_disjoint_merges_keeps_every_victim(
        spark, tmp_path):
    """The deduped multi-delete path must not LOSE rows: two merges on
    different keys, then restore — both base rows resurrect, and a
    genuinely duplicate base row resurrects TWICE (dedupe is by
    physical row identity, not value)."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(
        spark, _df(spark, [(1, "a"), (1, "a"), (2, "b"), (3, "c")]),
        t)                                                       # s1
    s1 = load_table_metadata(t)["current-snapshot-id"]
    merge_iceberg(spark, t, _chg(spark, [(1, "B", "U")]), ["id"])
    merge_iceberg(spark, t, _chg(spark, [(2, "C", "U")]), ["id"])
    s3 = load_table_metadata(t)["current-snapshot-id"]
    restore_iceberg(t, s1)                                       # s4
    assert _state(spark, t) == [(1, "a"), (1, "a"), (2, "b"), (3, "c")]
    tail = _feed(read_iceberg_cdf(spark, t, from_snapshot_id=s3))
    last = max(x[0] for x in tail)
    assert tail == sorted([
        (last, "delete", 1, "B"), (last, "delete", 2, "C"),
        (last, "insert", 1, "a"), (last, "insert", 1, "a"),
        (last, "insert", 2, "b")])


def test_restore_walls_and_expire_interop(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, [(1, "a")]), t)      # s1
    s1 = load_table_metadata(t)["current-snapshot-id"]
    merge_iceberg(spark, t, _chg(spark, [(2, "b", "I")]), ["id"])
    with pytest.raises(IcebergError, match="not in the table"):
        restore_iceberg(t, 424242)
    with pytest.raises(IcebergConcurrentCommit, match="re-read"):
        restore_iceberg(t, s1, expect_snapshot_id=999)
    sid = restore_iceberg(t, s1)
    # expire everything but the restore head: the SHARED manifest
    # list (also referenced by expired s1) must survive, and the
    # restored state must stay readable
    expire_iceberg_snapshots(spark, t, keep_last=1,
                             min_age_seconds=0.0)
    assert load_table_metadata(t)["current-snapshot-id"] == sid
    assert _state(spark, t) == [(1, "a")]
    # a restore to an EXPIRED snapshot refuses typed
    with pytest.raises(IcebergError, match="not in the table"):
        restore_iceberg(t, s1)


def test_merge_and_update_wall_on_non_identity_spec(spark, tmp_path):
    """merge/update stage identity partition values only — on a
    bucket-partitioned table they refuse typed instead of committing
    files outside the declared partitioning; delete_where (position
    deletes, partition-agnostic) still works."""
    import json
    import os

    from tulflow_spark.ext import iceberg as I

    t = str(tmp_path / "tbl")
    os.makedirs(f"{t}/metadata")
    d = f"{t}/data/b0"
    spark.createDataFrame([(4, "x4"), (8, "x8")],
                          "id long, v string") \
        .coalesce(1).write.parquet(d)
    part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
    rec = {"content": 0, "file_path": f"file://{d}/{part}",
           "file_format": "PARQUET",
           "partition": {"id_bucket": I.bucket_value(4, "long", 4)},
           "record_count": 2, "file_size_in_bytes": 1}
    blob = I.write_ocf(I._manifest_schema([("id_bucket", "int")]),
                       [{"status": 1, "snapshot_id": 1,
                         "data_file": rec}])
    open(f"{t}/metadata/m1.avro", "wb").write(blob)
    ml = I.write_ocf(I._MANIFEST_LIST_SCHEMA, [{
        "manifest_path": f"file://{t}/metadata/m1.avro",
        "manifest_length": len(blob), "partition_spec_id": 0,
        "content": 0, "added_snapshot_id": 1}])
    open(f"{t}/metadata/snap1.avro", "wb").write(ml)
    meta = {
        "format-version": 2, "table-uuid": "b-1", "location": t,
        "last-sequence-number": 1, "last-updated-ms": 1,
        "last-column-id": 2,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False,
             "type": "long"},
            {"id": 2, "name": "v", "required": False,
             "type": "string"}]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "id_bucket", "transform": "bucket[4]",
             "source-id": 1, "field-id": 1000}]}],
        "default-spec-id": 0, "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1,
                       "sequence-number": 1,
                       "manifest-list":
                       f"file://{t}/metadata/snap1.avro",
                       "summary": {"operation": "append"}}],
    }
    json.dump(meta, open(f"{t}/metadata/v1.metadata.json", "w"))
    open(f"{t}/metadata/version-hint.text", "w").write("1")
    with pytest.raises(IcebergError, match="non-identity"):
        merge_iceberg(spark, t, _chg(spark, [(4, "X", "U")]), ["id"])
    with pytest.raises(IcebergError, match="non-identity"):
        update_where_iceberg(spark, t, "id = 4", {"v": "'X'"})
    delete_where_iceberg(spark, t, "id = 4")
    assert sorted(r["id"] for r in read_iceberg(spark, t).collect()) \
        == [8]


def test_merge_evolve_schema_new_column(spark, tmp_path):
    """merge_iceberg(evolve_schema=True): a change set carrying a NEW
    column commits a widened schema (fresh field id, new schema-id)
    in the same metadata as the merge — old files read null, time
    travel below the merge keeps the old schema, the changelog
    carries the widened rows."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, [(1, "a"), (2, "b")]), t)
    s1 = load_table_metadata(t)["current-snapshot-id"]
    chg = spark.createDataFrame(
        [(2, "B", 7, "U"), (3, "c", 9, "I")],
        "id long, v string, w long, op string")
    # default: extra column walls on the missing-columns check? No —
    # extra columns are simply not table columns; the change set must
    # carry every TABLE column, which it does, and `w` projects away
    merge_iceberg(spark, t, chg, ["id"])
    assert read_iceberg(spark, t).columns == ["id", "v"]
    # evolved: w lands under a fresh id in a new schema-id
    chg2 = spark.createDataFrame(
        [(1, "A", 11, "U"), (4, "d", 13, "I")],
        "id long, v string, w long, op string")
    merge_iceberg(spark, t, chg2, ["id"], evolve_schema=True)
    got = sorted((r["id"], r["v"], r["w"])
                 for r in read_iceberg(spark, t).collect())
    assert got == [(1, "A", 11), (2, "B", None), (3, "c", None),
                   (4, "d", 13)]
    meta = load_table_metadata(t)
    assert meta["last-column-id"] == 3
    assert len(meta["schemas"]) == 2
    # time travel below the merge keeps the 2-column schema
    assert read_iceberg(spark, t, snapshot_id=s1).columns == \
        ["id", "v"]
    # the changelog's widened wave
    feed = read_iceberg_cdf(spark, t)
    last = max(r["_commit_seq"] for r in feed.collect())
    wave = sorted((r["_change_type"], r["id"], r["w"])
                  for r in feed.collect()
                  if r["_commit_seq"] == last)
    assert wave == [("delete", 1, None), ("insert", 1, 11),
                    ("insert", 4, 13)]
    # case-variant new columns refuse
    bad = spark.createDataFrame(
        [(1, "x", 1, 2, "U")],
        "id long, v string, w long, V long, op string")
    with pytest.raises(IcebergError, match="case"):
        merge_iceberg(spark, t, bad, ["id"], evolve_schema=True)
