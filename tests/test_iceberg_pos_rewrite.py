"""rewrite_position_deletes_iceberg: position-delete consolidation
(the ``rewrite_position_delete_files`` maintenance action) — many
pos-delete files fold into at most one per targeted data file (v2) /
one Puffin sidecar (v3), pairs deduped, in a row-preserving
``replace`` snapshot.  The third leg of the maintenance triad next to
convert_eq_deletes_iceberg and rewrite_iceberg_data_files."""

from __future__ import annotations

from tulflow_spark.ext.iceberg import (
    _live_files,
    append_iceberg_fixture,
    convert_eq_deletes_iceberg,
    delete_where_iceberg,
    load_table_metadata,
    merge_iceberg,
    read_iceberg,
    read_iceberg_cdf,
    rewrite_position_deletes_iceberg,
    upgrade_iceberg_v3,
    write_iceberg_fixture,
)


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)], "id long, v string")


def _content(spark, path):
    return sorted((r["id"], r["v"]) for r in
                  read_iceberg(spark, path).collect())


def _pos_files(path):
    _, dels = _live_files(load_table_metadata(path), None)
    return sorted({str(d["file_path"]) for d in dels
                   if int(d.get("content") or 0) == 1})


def _cdf(spark, path):
    return sorted((r["_commit_seq"], r["_change_type"], r["id"])
                  for r in read_iceberg_cdf(spark, path).collect())


def test_consolidate_v2_many_files_to_one(spark, tmp_path):
    """Three delete_where commits leave three position-delete files;
    consolidation folds them into one, preserving state AND the full
    changelog (replace contributes nothing), and a second call finds
    nothing to do."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _mk(spark, 0, 20), t)
    for pred in ("id = 1", "id = 5", "id IN (7, 9)"):
        delete_where_iceberg(spark, t, pred)
    before, cdf_before = _content(spark, t), _cdf(spark, t)
    assert len(_pos_files(t)) == 3
    assert rewrite_position_deletes_iceberg(spark, t) is not None
    assert _content(spark, t) == before
    assert _cdf(spark, t) == cdf_before
    assert len(_pos_files(t)) == 1
    _, dels = _live_files(load_table_metadata(t), None)
    assert sum(int(d["record_count"]) for d in dels) == 4  # deduped
    assert rewrite_position_deletes_iceberg(spark, t) is None


def test_maintenance_triad_end_to_end(spark, tmp_path):
    """The full maintenance story on one table: merges accrue eq
    debt -> conversion turns it into position debt -> more position
    DML accrues files -> consolidation folds them -> state identical
    to a never-maintained logical twin throughout."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _mk(spark, 0, 20), t)
    ch = spark.createDataFrame(
        [(1, "u1", "U"), (2, "", "D")], "id long, v string, op string")
    merge_iceberg(spark, t, ch, ["id"])
    ch2 = spark.createDataFrame(
        [(3, "u3", "U")], "id long, v string, op string")
    merge_iceberg(spark, t, ch2, ["id"])
    assert convert_eq_deletes_iceberg(spark, t) is not None
    delete_where_iceberg(spark, t, "id = 6")
    delete_where_iceberg(spark, t, "id = 8")
    expect = ([(1, "u1"), (3, "u3")]
              + [(i, f"x{i}") for i in range(20)
                 if i not in (1, 2, 3, 6, 8)])
    assert _content(spark, t) == sorted(expect)
    assert len(_pos_files(t)) >= 3
    assert rewrite_position_deletes_iceberg(spark, t) is not None
    assert _content(spark, t) == sorted(expect)
    assert len(_pos_files(t)) == 1


def test_consolidate_v3_sidecars(spark, tmp_path):
    """v3: DVs from commits touching DIFFERENT data files live in
    separate Puffin sidecars; consolidation merges them into ONE
    sidecar (still one DV entry per referenced file) and is then
    idempotent.  Same-file re-deletes already merge at write time,
    so a single-sidecar table returns None."""
    t = str(tmp_path / "t3")
    write_iceberg_fixture(spark, _mk(spark, 0, 10), t)
    upgrade_iceberg_v3(t)
    append_iceberg_fixture(spark, _mk(spark, 10, 20), t)
    delete_where_iceberg(spark, t, "id = 2")     # DV on file 1
    delete_where_iceberg(spark, t, "id = 15")    # DV on file 2
    before = _content(spark, t)
    assert len(_pos_files(t)) == 2
    assert rewrite_position_deletes_iceberg(spark, t) is not None
    assert _content(spark, t) == before
    _, dels = _live_files(load_table_metadata(t), None)
    assert len(_pos_files(t)) == 1 and len(dels) == 2
    refs = [str(d["referenced_data_file"]) for d in dels]
    assert len(refs) == len(set(refs))
    assert rewrite_position_deletes_iceberg(spark, t) is None


def test_consolidate_nothing_to_do(spark, tmp_path):
    """A clean table and a single clean position-delete file both
    return None — the op never commits a no-op snapshot."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _mk(spark, 0, 8), t)
    assert rewrite_position_deletes_iceberg(spark, t) is None
    delete_where_iceberg(spark, t, "id = 1")
    n_snaps = len(load_table_metadata(t)["snapshots"])
    assert rewrite_position_deletes_iceberg(spark, t) is None
    assert len(load_table_metadata(t)["snapshots"]) == n_snaps


def test_consolidate_v3_multi_position_vectors(spark, tmp_path):
    """r15 review (live-repro'd crash): a deletion vector holding two
    or more positions flows from _read_dv_map into the v3 writer as a
    numpy array, whose truthiness is ambiguous — consolidation must
    handle real (multi-row) vectors, reading each sidecar exactly
    once."""
    t = str(tmp_path / "t3m")
    write_iceberg_fixture(spark, _mk(spark, 0, 10), t)
    upgrade_iceberg_v3(t)
    append_iceberg_fixture(spark, _mk(spark, 10, 20), t)
    delete_where_iceberg(spark, t, "id IN (2, 3, 5)")   # 3-pos DV
    delete_where_iceberg(spark, t, "id IN (15, 17)")    # 2-pos DV
    before = _content(spark, t)
    assert rewrite_position_deletes_iceberg(spark, t) is not None
    assert _content(spark, t) == before
    _, dels = _live_files(load_table_metadata(t), None)
    assert len(_pos_files(t)) == 1
    assert sum(int(d["record_count"]) for d in dels) == 5
    assert rewrite_position_deletes_iceberg(spark, t) is None


def test_consolidate_converges_across_multiple_targets(spark,
                                                       tmp_path):
    """r15 review (live-repro'd loop): when the consolidated output
    spans several parquet parts (pairs targeting multiple data
    files), the nothing-to-do rule must recognize the converged state
    — one pass, then None forever, snapshot count stable."""
    t = str(tmp_path / "tm")
    write_iceberg_fixture(spark, _mk(spark, 0, 10), t)
    append_iceberg_fixture(spark, _mk(spark, 10, 20), t)
    append_iceberg_fixture(spark, _mk(spark, 20, 30), t)
    # four commits, each touching MULTIPLE data files
    for pred in ("id IN (1, 11, 21)", "id IN (3, 13)",
                 "id IN (5, 25)", "id IN (7, 17, 27)"):
        delete_where_iceberg(spark, t, pred)
    before = _content(spark, t)
    assert len(_pos_files(t)) == 4
    assert rewrite_position_deletes_iceberg(spark, t) is not None
    assert _content(spark, t) == before
    n_files = len(_pos_files(t))
    assert n_files <= 3     # at most one per targeted data file
    n_snaps = len(load_table_metadata(t)["snapshots"])
    for _ in range(3):
        assert rewrite_position_deletes_iceberg(spark, t) is None
    assert len(load_table_metadata(t)["snapshots"]) == n_snaps
    assert len(_pos_files(t)) == n_files
