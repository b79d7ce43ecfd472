"""ext/iceberg.py::read_iceberg_cdf — the Iceberg changelog scan:
row-level changes (insert/delete) derived from per-snapshot live-file
diffs, position/DV victims fetched by position, equality victims from
the alive-at-predecessor view, compactions invisible, typed walls on
underivable shapes."""

from __future__ import annotations

import pytest

from tulflow_spark.ext.iceberg import (
    IcebergError,
    _live_files,
    append_iceberg_fixture,
    delete_equality_iceberg_fixture,
    delete_positions_iceberg_fixture,
    delete_positions_iceberg_v3,
    iceberg_snapshots,
    load_table_metadata,
    read_iceberg,
    read_iceberg_cdf,
    rewrite_iceberg_data_files,
    upgrade_iceberg_v3,
    write_iceberg_fixture,
)


def _df(spark, lo, hi):
    from pyspark.sql import functions as F

    return (spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)], "id long, v string")
        .coalesce(1).sortWithinPartitions("id"))


def _feed(df):
    return sorted((r["_commit_seq"], r["_change_type"], r["id"])
                  for r in df.collect())


def test_changelog_appends_position_and_equality_deletes(spark,
                                                         tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 6), t)         # seq 1
    append_iceberg_fixture(spark, _df(spark, 6, 10), t)       # seq 2
    meta = load_table_metadata(t)
    files, _ = _live_files(meta, None)
    first = next(d["file_path"] for d in files
                 if int(d["__seq"]) == 1)
    # rows are id-sorted: positions 0,2 are ids 0,2
    delete_positions_iceberg_fixture(spark, t, {first: [0, 2]})  # 3
    delete_equality_iceberg_fixture(
        spark, t, [{"v": "x1"}, {"v": "x7"}], ["v"])          # seq 4
    got = _feed(read_iceberg_cdf(spark, t))
    want = sorted(
        [(1, "insert", i) for i in range(6)]
        + [(2, "insert", i) for i in range(6, 10)]
        + [(3, "delete", 0), (3, "delete", 2)]
        + [(4, "delete", 1), (4, "delete", 7)])
    assert got == want
    # the feed net-matches the table state
    ins = {i for _, c, i in got if c == "insert"}
    dels = {i for _, c, i in got if c == "delete"}
    live = {r["id"] for r in read_iceberg(spark, t).collect()}
    assert ins - dels == live
    # windowed: from the second snapshot → only the delete snapshots
    s2 = iceberg_snapshots(t)[1]["snapshot_id"]
    tail = _feed(read_iceberg_cdf(spark, t, from_snapshot_id=s2))
    assert tail == sorted([(3, "delete", 0), (3, "delete", 2),
                           (4, "delete", 1), (4, "delete", 7)])


def test_changelog_equality_respects_prior_position_deletes(
        spark, tmp_path):
    """An equality delete's victims exclude rows already position-
    deleted — no double delivery."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 5), t)         # seq 1
    meta = load_table_metadata(t)
    (f0,) = [d["file_path"] for d in _live_files(meta, None)[0]]
    delete_positions_iceberg_fixture(spark, t, {f0: [3]})     # id 3
    delete_equality_iceberg_fixture(
        spark, t, [{"v": "x3"}, {"v": "x4"}], ["v"])          # seq 3
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[1] == "delete"] == \
        [(2, "delete", 3), (3, "delete", 4)]


def test_changelog_dv_diff_v3(spark, tmp_path):
    """v3 DV growth delivers only the NEWLY-dead positions."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 8), t)
    upgrade_iceberg_v3(t)
    meta = load_table_metadata(t)
    (f0,) = [d["file_path"] for d in _live_files(meta, None)[0]]
    delete_positions_iceberg_v3(spark, t, {f0: [1, 3]})
    delete_positions_iceberg_v3(spark, t, {f0: [3, 5]})
    got = _feed(read_iceberg_cdf(spark, t))
    dels = [(s, i) for s, c, i in got if c == "delete"]
    assert dels == [(2, 1), (2, 3), (3, 5)]


def test_changelog_replace_invisible(spark, tmp_path):
    """Compaction (operation=replace) is row-preserving: contributes
    nothing, and the feed stays consistent across it."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 4), t)         # seq 1
    append_iceberg_fixture(spark, _df(spark, 4, 8), t)        # seq 2
    rewrite_iceberg_data_files(spark, t, min_files=1)         # seq 3
    append_iceberg_fixture(spark, _df(spark, 8, 10), t)       # seq 4
    got = _feed(read_iceberg_cdf(spark, t))
    assert got == sorted(
        [(1, "insert", i) for i in range(4)]
        + [(2, "insert", i) for i in range(4, 8)]
        + [(4, "insert", i) for i in range(8, 10)])


def test_changelog_walls(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 4), t)
    with pytest.raises(IcebergError, match="not within"):
        read_iceberg_cdf(spark, t, from_snapshot_id=999)
    # position deletes over LIVE equality deletes: typed
    delete_equality_iceberg_fixture(spark, t, [{"v": "x0"}], ["v"])
    meta = load_table_metadata(t)
    (f0,) = [d["file_path"] for d in _live_files(meta, None)[0]]
    delete_positions_iceberg_fixture(spark, t, {f0: [1]})
    with pytest.raises(IcebergError, match="live equality"):
        read_iceberg_cdf(spark, t).collect()


def test_changelog_orc_position_victims(spark, tmp_path):
    """ORC victims fetch through the indexed scan."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 6), t,
                          file_format="orc")
    meta = load_table_metadata(t)
    (f0,) = [d["file_path"] for d in _live_files(meta, None)[0]]
    delete_positions_iceberg_fixture(spark, t, {f0: [1, 4]})
    got = _feed(read_iceberg_cdf(spark, t))
    assert [x for x in got if x[1] == "delete"] == \
        [(2, "delete", 1), (2, "delete", 4)]


def test_changelog_added_file_with_same_snapshot_dv(spark, tmp_path):
    """r13 review finding 1: a snapshot that ADDS a file carrying its
    own DV (CLONE/RESTORE shape) must not deliver the dead-on-arrival
    positions as deletes — the insert wave already excludes them, so
    a delete would describe a row that never existed.  Foreign-shaped:
    collapse an append + DV commit into one snapshot by dropping the
    intermediate snapshot from the metadata (entries carry explicit
    sequence numbers, so resolution survives)."""
    import json

    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 4), t)         # s1
    upgrade_iceberg_v3(t)
    append_iceberg_fixture(spark, _df(spark, 4, 8), t)        # s2: +B
    meta = load_table_metadata(t)
    fb = next(d["file_path"] for d in _live_files(meta, None)[0]
              if int(d["__seq"]) == 2)
    delete_positions_iceberg_v3(spark, t, {fb: [0]})          # s3: DV(B)
    hint = open(f"{t}/metadata/version-hint.text").read().strip()
    mp = f"{t}/metadata/v{hint}.metadata.json"
    m = json.loads(open(mp).read())
    by_seq = {s["sequence-number"]: s for s in m["snapshots"]}
    s1, s2, s3 = by_seq[1], by_seq[2], by_seq[3]
    m["snapshots"] = [s1, dict(s3, **{
        "parent-snapshot-id": s1["snapshot-id"]})]
    m["snapshot-log"] = [e for e in m["snapshot-log"]
                         if e["snapshot-id"] != s2["snapshot-id"]]
    with open(mp, "w") as fh:
        fh.write(json.dumps(m))
    got = _feed(read_iceberg_cdf(spark, t))
    # B arrives with one dead row: 3 inserts at seq 3, NO deletes
    import pyarrow.orc  # noqa: F401  (keep import-order linters calm)

    ins3 = [i for s, c, i in got if s == 3 and c == "insert"]
    assert len(ins3) == 3 and set(ins3) <= set(range(4, 8))
    assert not [x for x in got if x[1] == "delete"]
    # net-consistency with the table state
    live = {r["id"] for r in read_iceberg(spark, t).collect()}
    assert {i for _, c, i in got if c == "insert"} == live


def test_changelog_skips_side_branch_snapshots(spark, tmp_path):
    """r13 review finding 2: the changelog walks the TO snapshot's
    parent lineage — a snapshot reachable only through a branch ref
    must not contribute (or displace the diff base of) the main
    feed."""
    import json

    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 3), t)         # s1
    append_iceberg_fixture(spark, _df(spark, 3, 6), t)        # s2
    before = _feed(read_iceberg_cdf(spark, t))
    hint = open(f"{t}/metadata/version-hint.text").read().strip()
    mp = f"{t}/metadata/v{hint}.metadata.json"
    m = json.loads(open(mp).read())
    s1 = min(m["snapshots"], key=lambda s: s["sequence-number"])
    s2 = max(m["snapshots"], key=lambda s: s["sequence-number"])
    # fake branch snapshot off s1, sequence BETWEEN s1 and s2 on the
    # global sort (the shape that corrupted a list-order walk)
    branch = dict(s2)
    branch["snapshot-id"] = 424242
    branch["sequence-number"] = s2["sequence-number"]
    branch["parent-snapshot-id"] = s1["snapshot-id"]
    branch["timestamp-ms"] = s1["timestamp-ms"] + 1
    m["snapshots"] = [s1, branch, s2]
    m["refs"]["dev"] = {"snapshot-id": 424242, "type": "branch"}
    with open(mp, "w") as fh:
        fh.write(json.dumps(m))
    assert _feed(read_iceberg_cdf(spark, t)) == before
    # the branch head reads ITS lineage
    got = _feed(read_iceberg_cdf(spark, t, to_snapshot_id=424242))
    assert {i for _, c, i in got if c == "insert"} == set(range(6))


def test_changelog_empty_range_with_nested_column(spark, tmp_path):
    """r13 advice (low): an EMPTY change range over a table whose
    schema carries a nested (struct) column must return an empty
    typed frame, not crash on the unhashable dict type."""
    import json

    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 3), t)         # s1
    append_iceberg_fixture(spark, _df(spark, 3, 6), t)        # s2
    s2 = load_table_metadata(t)["current-snapshot-id"]
    rewrite_iceberg_data_files(spark, t)                      # s3: replace
    assert load_table_metadata(t)["current-snapshot-id"] != s2
    hint = open(f"{t}/metadata/version-hint.text").read().strip()
    mp = f"{t}/metadata/v{hint}.metadata.json"
    m = json.loads(open(mp).read())
    sch = m["schemas"][0] if "schemas" in m else m["schema"]
    sch["fields"].append({
        "id": 99, "name": "meta", "required": False,
        "type": {"type": "struct", "fields": [
            {"id": 100, "name": "k", "required": False,
             "type": "string"}]}})
    with open(mp, "w") as fh:
        fh.write(json.dumps(m))
    # (s2, s3] contains only the compaction — contributes nothing
    out = read_iceberg_cdf(spark, t, from_snapshot_id=s2)
    assert out.count() == 0
    assert {"id", "v", "meta", "_change_type", "_commit_seq",
            "_snapshot_id"} <= set(out.columns)
