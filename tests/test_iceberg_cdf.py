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
