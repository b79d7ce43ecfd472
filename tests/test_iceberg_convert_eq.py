"""convert_eq_deletes_iceberg: minor compaction — every live equality
delete materialized as position deletes (v2) / deletion vectors (v3)
in one ``replace`` snapshot, data files untouched.  The operator that
caps a ``merge_iceberg`` feed's eq-delete debt without paying a data
rewrite (cf. rewrite_iceberg_data_files)."""

from __future__ import annotations

import pytest

from tulflow_spark.ext.iceberg import (
    IcebergError,
    _live_files,
    convert_eq_deletes_iceberg,
    delete_where_iceberg,
    iceberg_delete_debt,
    load_table_metadata,
    merge_iceberg,
    read_iceberg,
    read_iceberg_cdf,
    upgrade_iceberg_v3,
    write_iceberg_fixture,
)


def _base(spark, path, n=10, partition_by=None):
    df = spark.createDataFrame(
        [(i, f"x{i}", i % 2) for i in range(n)],
        "id long, v string, p long").coalesce(1)
    write_iceberg_fixture(spark, df, path, partition_by=partition_by)


def _merge(spark, path, rows):
    ch = spark.createDataFrame(rows, "id long, v string, p long, "
                                     "op string")
    merge_iceberg(spark, path, ch, ["id"])


def _content(spark, path):
    return sorted((r["id"], r["v"], r["p"]) for r in
                  read_iceberg(spark, path).collect())


def _delete_kinds(path):
    _, dels = _live_files(load_table_metadata(path), None)
    return sorted({(int(d.get("content") or 0),
                    str(d.get("file_format") or "").upper())
                   for d in dels})


def _cdf_rows(spark, path, frm=0):
    return sorted(
        (r["_commit_seq"], r["_change_type"], r["id"], r["v"])
        for r in read_iceberg_cdf(spark, path,
                                  from_snapshot_id=frm).collect())


def test_convert_v2_preserves_content_and_changelog(spark, tmp_path):
    """Two overlapping merges (shared victim key) convert to ONE
    deduped position-delete set; state, full-history changelog, and
    idempotence all hold."""
    t = str(tmp_path / "t")
    _base(spark, t)
    _merge(spark, t, [(1, "u1", 1, "U"), (2, "", 0, "D"),
                      (99, "n", 1, "I")])
    _merge(spark, t, [(1, "u2", 1, "U"), (3, "", 1, "D")])
    before = _content(spark, t)
    cdf_before = _cdf_rows(spark, t)
    debt = iceberg_delete_debt(t)
    # one eq delete PER STAGED PART per merge — at least one per merge
    assert debt["eq_delete_files"] >= 2
    sid = convert_eq_deletes_iceberg(spark, t)
    assert sid is not None
    assert _content(spark, t) == before
    # only position deletes remain, and the replace snapshot
    # contributed NOTHING to the changelog
    assert _delete_kinds(t) == [(1, "PARQUET")]
    assert iceberg_delete_debt(t)["eq_delete_files"] == 0
    assert _cdf_rows(spark, t) == cdf_before
    # nothing left to convert
    assert convert_eq_deletes_iceberg(spark, t) is None


def test_convert_unblocks_position_dml_changelog(spark, tmp_path):
    """The wall this operator retires: position-delete DML over a
    table with LIVE equality deletes refuses typed (victim overlap
    not derivable); after conversion the same DML commits AND
    changelogs cleanly."""
    walled = str(tmp_path / "w")
    _base(spark, walled)
    _merge(spark, walled, [(1, "u1", 1, "U")])
    with pytest.raises(IcebergError, match="equality deletes"):
        delete_where_iceberg(spark, walled, "id = 5")

    ok = str(tmp_path / "ok")
    _base(spark, ok)
    _merge(spark, ok, [(1, "u1", 1, "U")])
    convert_eq_deletes_iceberg(spark, ok)
    frm = load_table_metadata(ok)["current-snapshot-id"]
    delete_where_iceberg(spark, ok, "id = 5")
    got = _cdf_rows(spark, ok, frm=frm)
    assert [(ct, i) for _, ct, i, _ in got] == [("delete", 5)]


def test_convert_v3_merges_prior_dv(spark, tmp_path):
    """v3: victims land as deletion vectors; a data file already
    carrying a DV gets ONE merged vector (spec invariant), the eq
    files retire in the same atomic snapshot."""
    t = str(tmp_path / "t3")
    _base(spark, t)
    upgrade_iceberg_v3(t)
    delete_where_iceberg(spark, t, "id = 9")      # prior DV on file0
    _merge(spark, t, [(1, "u1", 1, "U"), (2, "", 0, "D")])
    before = _content(spark, t)
    assert convert_eq_deletes_iceberg(spark, t) is not None
    assert _content(spark, t) == before
    assert _delete_kinds(t) == [(1, "PUFFIN")]
    # at most one live DV per referenced data file
    _, dels = _live_files(load_table_metadata(t), None)
    refs = [str(d["referenced_data_file"]) for d in dels]
    assert len(refs) == len(set(refs))


def test_convert_partitioned_table_global_deletes(spark, tmp_path):
    """merge_iceberg stages GLOBAL eq deletes (partition {}) even on
    a partitioned table; conversion handles the partitioned manifest
    round-trip (full-state re-serialization must keep every partition
    struct, or pruning breaks).  Partition-SCOPED deletes are covered
    by test_convert_partition_scoped_eq_delete below."""
    t = str(tmp_path / "tp")
    _base(spark, t, partition_by=["p"])
    _merge(spark, t, [(1, "u1", 1, "U"), (4, "", 0, "D")])
    before = _content(spark, t)
    assert convert_eq_deletes_iceberg(spark, t) is not None
    assert _content(spark, t) == before
    assert _delete_kinds(t) == [(1, "PARQUET")]
    # partition pruning still works over the full-state manifests
    assert sorted(r["id"] for r in read_iceberg(spark, t)
                  .where("p = 0").collect()) == [0, 2, 6, 8]


def test_convert_partition_scoped_eq_delete(spark, tmp_path):
    """A partition-STAMPED eq delete (the Flink partitioned-writer
    shape) kills matching rows only in its partition — the same value
    alive in another partition must survive BOTH the read and the
    conversion, and the candidate filter must use the scan path's
    subset semantics (r15 review: exact-dict equality here would miss
    victims and resurrect them once the eq file is tombstoned)."""
    from tulflow_spark.ext.iceberg import (
        delete_equality_iceberg_fixture,
    )

    t = str(tmp_path / "ts")
    df = spark.createDataFrame(
        [(1, "dup", 0), (2, "dup", 1), (3, "x3", 0), (4, "x4", 1)],
        "id long, v string, p long")
    write_iceberg_fixture(spark, df, t, partition_by=["p"])
    delete_equality_iceberg_fixture(
        spark, t, [{"v": "dup"}], ["v"], partition={"p": 1})
    before = _content(spark, t)
    assert (1, "dup", 0) in before          # other partition's twin
    assert (2, "dup", 1) not in before      # scoped victim is dead
    assert convert_eq_deletes_iceberg(spark, t) is not None
    assert _content(spark, t) == before
    assert _delete_kinds(t) == [(1, "PARQUET")]
    assert iceberg_delete_debt(t)["delete_rows"] == 1


def test_convert_victimless_eq_retires_clean(spark, tmp_path):
    """An eq delete matching nothing (D on absent keys) converts to a
    tombstone-only replace: no position-delete file is staged."""
    t = str(tmp_path / "tv")
    _base(spark, t, n=4)
    _merge(spark, t, [(100, "", 0, "D"), (101, "", 0, "D")])
    before = _content(spark, t)
    assert convert_eq_deletes_iceberg(spark, t) is not None
    assert _content(spark, t) == before
    assert _delete_kinds(t) == []


def test_apply_sink_convert_mode_bounds_eq_debt(spark, tmp_path):
    """compact_mode='convert' in the CDC apply loop: eq debt stays
    bounded by the threshold, content matches an unmaintained twin,
    and — unlike rewrite mode — the data files are NEVER rewritten
    (the twin's data file count is preserved)."""
    from tulflow_spark.ext.iceberg import iceberg_cdf_apply_sink

    plain = str(tmp_path / "plain")
    conv = str(tmp_path / "conv")
    sink_plain = iceberg_cdf_apply_sink(plain, "cva", ["id"])
    sink_conv = iceberg_cdf_apply_sink(
        conv, "cvb", ["id"], compact_after_files=2,
        compact_mode="convert")

    def batch(rows, seq):
        # one partition => one eq-delete part per applied merge, so
        # the debt counters below step by exactly one per batch
        return spark.createDataFrame(
            [(i, v, ct, seq) for (i, v, ct) in rows],
            "id long, v string, _change_type string, _commit_seq long"
        ).coalesce(1)

    batches = [[(i, f"x{i}", "insert") for i in range(6)]]
    for b in range(1, 6):
        batches.append([(b % 6, f"u{b}", "update_postimage"),
                        (50 + b, f"n{b}", "insert")])
    eq_debt = []
    for bid, rows in enumerate(batches):
        df = batch(rows, bid)
        sink_plain(df, bid)
        sink_conv(df, bid)
        eq_debt.append(iceberg_delete_debt(conv)["eq_delete_files"])
    # un-maintained: at least one eq file per post-seed merge batch
    plain_eq = iceberg_delete_debt(plain)["eq_delete_files"]
    assert plain_eq >= 5
    # armed: observed eq debt is bounded by the threshold step (the
    # trigger converts the moment the count reaches 2, so what a
    # reader can ever see is one batch's worth above zero), and the
    # conversion actually fired
    assert max(eq_debt) < plain_eq and 0 in eq_debt[1:]
    assert eq_debt[-1] <= 2
    got_plain = sorted((r["id"], r["v"]) for r in
                       read_iceberg(spark, plain).collect())
    got_conv = sorted((r["id"], r["v"]) for r in
                      read_iceberg(spark, conv).collect())
    assert got_plain == got_conv
    # conversion never rewrites data: both targets accreted the same
    # data files (seed + one per merge batch)
    n_plain = len(_live_files(load_table_metadata(plain), None)[0])
    n_conv = len(_live_files(load_table_metadata(conv), None)[0])
    assert n_conv == n_plain


def test_apply_sink_rewrite_mode_pure_delete_feed(spark, tmp_path):
    """r15 review: a pure-delete feed onto an empty-seeded target has
    ZERO live data files, so rewrite-mode maintenance used to raise
    'nothing to rewrite' every batch (swallowed, debt unbounded).
    The policy now routes that state through the conversion, which
    retires the victimless eq files — debt stays bounded and the
    policy never disarms."""
    from tulflow_spark.ext.iceberg import (
        iceberg_cdf_apply_sink,
        read_iceberg,
    )

    t = str(tmp_path / "pd")
    sink = iceberg_cdf_apply_sink(t, "pdx", ["id"],
                                  compact_after_files=2)

    def batch(rows, seq):
        return spark.createDataFrame(
            [(i, v, ct, seq) for (i, v, ct) in rows],
            "id long, v string, _change_type string, _commit_seq long"
        ).coalesce(1)

    debts = []
    for bid in range(4):
        sink(batch([(bid, "", "delete"), (100 + bid, "", "delete")],
                   bid), bid)
        debts.append(iceberg_delete_debt(t)["eq_delete_files"])
    # bounded: every observed value is below the threshold (the
    # trigger converts inside the sink call the moment it trips)
    assert max(debts) < 2 + 2       # threshold + one batch's parts
    assert debts[-1] < 4
    assert iceberg_delete_debt(t)["data_files"] == 0
    assert read_iceberg(spark, t).collect() == []
