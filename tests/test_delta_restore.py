"""ext/delta_log.py::restore_delta — RESTORE as a writer verb: one
reference-moving commit back to an old version, CDF-exact, typed on
vacuumed files / schema drift / foreign features."""

from __future__ import annotations

import json
import os

import pytest

from tulflow_spark.ext.delta_log import (
    DeltaConcurrentCommit,
    DeltaProtocolError,
    _replay,
    delete_rows_with_dv,
    delete_where,
    latest_version,
    read_delta,
    read_delta_cdf,
    restore_delta,
    write_delta,
)

CDF = {"delta.enableChangeDataFeed": "true"}


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)], "id long, v string")


def _ids(spark, t, **kw):
    return sorted(r["id"] for r in read_delta(spark, t, **kw).collect())


def test_restore_moves_references_only(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 6), t, mode="append")           # v0
    write_delta(_df(spark, 6, 9), t, mode="append")           # v1
    delete_where(spark, t, "id < 2")                          # v2
    v = restore_delta(spark, t, 0)
    assert v == 3
    assert _ids(spark, t) == list(range(6))
    # the restored state is EXACTLY v0's file set (by reference)
    assert set(_replay(spark, t, v).live) == \
        set(_replay(spark, t, 0).live)
    # restoring to the present is a no-op
    assert restore_delta(spark, t, v) == v
    assert latest_version(t) == v


def test_restore_stages_cdf(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 4), t, mode="append",
                configuration=CDF)                            # v0
    write_delta(_df(spark, 4, 7), t, mode="append")           # v1
    v = restore_delta(spark, t, 0)                            # v2
    feed = read_delta_cdf(spark, t, -1)
    got = sorted((r["_commit_version"], r["_change_type"], r["id"])
                 for r in feed.collect())
    assert got == sorted(
        [(0, "insert", i) for i in range(4)]
        + [(1, "insert", i) for i in range(4, 7)]
        + [(v, "delete", i) for i in range(4, 7)])
    # net state consistency
    ins = [i for _, c, i in got if c == "insert"]
    dels = {i for _, c, i in got if c == "delete"}
    assert sorted(set(ins) - dels) == _ids(spark, t)


def test_restore_dv_table_und_dv_diff_feed(spark, tmp_path):
    """Restoring across a DV delete re-adds the file under its OLD
    (absent) descriptor; the feed derives the un-deleted rows as
    inserts from the DV diff — no cdc needed."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 8).coalesce(1), t, mode="append")
    (ap,) = _replay(spark, t, None).live
    delete_rows_with_dv(spark, t, {ap: [1, 3]})               # v1
    v = restore_delta(spark, t, 0)                            # v2
    assert _ids(spark, t) == list(range(8))
    tail = read_delta_cdf(spark, t, 1, v)
    got = sorted((r["_change_type"], r["id"]) for r in tail.collect())
    assert got == [("insert", 1), ("insert", 3)]


def test_restore_cdc_includes_dv_diff(spark, tmp_path):
    """r13 advice (high): a CDF restore that both removes files AND
    reverts a deletion vector must stage the DV-diff rows in its cdc
    files — cdc actions are exclusive for the version, so an
    incomplete staging silently drops the un-deleted rows from the
    feed (a downstream apply sink would lose them permanently)."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 6).coalesce(1), t, mode="append",
                configuration=CDF)                            # v0
    (ap,) = _replay(spark, t, None).live
    write_delta(_df(spark, 6, 9), t, mode="append")           # v1
    delete_rows_with_dv(spark, t, {ap: [1, 3]})               # v2
    v = restore_delta(spark, t, 0)                            # v3
    assert _ids(spark, t) == list(range(6))
    feed = read_delta_cdf(spark, t, 2, v)
    got = sorted((r["_change_type"], r["id"]) for r in feed.collect())
    # appended rows die AND the DV-dead rows come back
    assert got == sorted([("delete", i) for i in range(6, 9)]
                         + [("insert", 1), ("insert", 3)])
    # the restore commit stages cdc (reader's cdc-wins rule applies)
    acts = [json.loads(ln) for ln in open(
        f"{t}/_delta_log/{v:020d}.json") if ln.strip()]
    assert any(a.get("cdc") for a in acts)


def test_restore_cdc_applies_dv_of_removed_file(spark, tmp_path):
    """r13 advice (medium): a removed file carrying a DV stages only
    its SURVIVORS as delete — the DV-dead rows already left the feed
    when the DV was written; re-delivering them double-deletes."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 4).coalesce(1), t, mode="append",
                configuration=CDF)                            # v0
    write_delta(_df(spark, 4, 9).coalesce(1), t, mode="append")  # v1
    snap = _replay(spark, t, None)
    (bp,) = [p for p in snap.live
             if p not in _replay(spark, t, 0).live]
    # kill ids 4 and 6 inside the v1 file (positions 0 and 2)
    delete_rows_with_dv(spark, t, {bp: [0, 2]})               # v2
    v = restore_delta(spark, t, 0)                            # v3
    assert _ids(spark, t) == list(range(4))
    feed = read_delta_cdf(spark, t, 2, v)
    got = sorted((r["_change_type"], r["id"]) for r in feed.collect())
    # only the SURVIVORS of the removed file die: 5, 7, 8
    assert got == [("delete", 5), ("delete", 7), ("delete", 8)]


def test_restore_pure_dv_change_stages_no_cdc(spark, tmp_path):
    """A restore touching ONLY DV-changed files stages no cdc — the
    reader's DV-diff rule resolves the same-path re-add exactly, in
    both directions (un-delete, then re-delete)."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 6).coalesce(1), t, mode="append",
                configuration=CDF)                            # v0
    (ap,) = _replay(spark, t, None).live
    delete_rows_with_dv(spark, t, {ap: [1, 3]})               # v1
    r1 = restore_delta(spark, t, 0)                           # v2: un-delete
    r2 = restore_delta(spark, t, 1)                           # v3: re-delete
    assert _ids(spark, t) == [0, 2, 4, 5]
    got = sorted((r["_commit_version"], r["_change_type"], r["id"])
                 for r in read_delta_cdf(spark, t, 1).collect())
    assert got == sorted(
        [(r1, "insert", 1), (r1, "insert", 3)]
        + [(r2, "delete", 1), (r2, "delete", 3)])
    for rv in (r1, r2):
        acts = [json.loads(ln) for ln in open(
            f"{t}/_delta_log/{rv:020d}.json") if ln.strip()]
        assert not any(a.get("cdc") for a in acts), \
            "pure DV-changed restore needs no cdc staging"


def test_restore_walls(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 4), t, mode="append")           # v0
    write_delta(_df(spark, 4, 6), t, mode="append")           # v1
    with pytest.raises(DeltaProtocolError, match="out of bounds"):
        restore_delta(spark, t, 9)
    with pytest.raises(DeltaConcurrentCommit, match="re-read"):
        restore_delta(spark, t, 0, expect_version=9)
    # schema drift between the versions → typed
    from pyspark.sql import functions as F

    write_delta(_df(spark, 6, 7).withColumn("w", F.lit(1)), t,
                mode="append", merge_schema=True)             # v2
    with pytest.raises(DeltaProtocolError, match="schema changed"):
        restore_delta(spark, t, 0)
    # appendOnly → typed
    t2 = str(tmp_path / "t2")
    write_delta(_df(spark, 0, 2), t2, mode="append",
                configuration={"delta.appendOnly": "true"})
    write_delta(_df(spark, 2, 3), t2, mode="append")
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        restore_delta(spark, t2, 0)


def test_restore_vacuumed_file_typed(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 4), t, mode="append")           # v0
    delete_where(spark, t, "id >= 0")                         # v1: all
    # physically delete v0's files (what vacuum would reclaim)
    for p in _replay(spark, t, 0).live:
        from urllib.parse import unquote

        os.remove(f"{t}/{unquote(p)}")
    with pytest.raises(DeltaProtocolError, match="vacuumed"):
        restore_delta(spark, t, 0)


def test_restore_commit_shape_is_protocol_plain(spark, tmp_path):
    """The restore commit re-adds the OLD add actions verbatim
    (stats carried) with dataChange=true — a conformant reader
    replays it with no special casing."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 4), t, mode="append")           # v0
    write_delta(_df(spark, 4, 6), t, mode="append")           # v1
    delete_where(spark, t, "id = 0")                          # v2
    v = restore_delta(spark, t, 0)
    acts = [json.loads(ln) for ln in open(
        f"{t}/_delta_log/{v:020d}.json") if ln.strip()]
    adds = [a["add"] for a in acts if a.get("add")]
    rms = [a["remove"] for a in acts if a.get("remove")]
    assert adds and rms
    assert all(a.get("dataChange") for a in adds)
    assert all(a.get("stats") for a in adds), \
        "re-adds must carry the original stats (skipping index)"
    assert set(a["path"] for a in adds) <= \
        set(_replay(spark, t, 0).live)


def test_restore_across_cleaned_log(spark, tmp_path):
    """Checkpoint-only histories: restoring to a version AT or above
    the checkpoint replays fine; a version below the surviving-log
    horizon refuses typed (the file set is not reconstructible — the
    same class as the vacuumed wall)."""
    from tulflow_spark.ext.delta_log import write_checkpoint

    t = str(tmp_path / "t")
    for lo in (0, 2, 4, 6):
        write_delta(_df(spark, lo, lo + 2), t, mode="append")
    write_checkpoint(spark, t)                         # at v3
    for v in (0, 1, 2):
        os.remove(f"{t}/_delta_log/{v:020d}.json")
    assert _ids(spark, t) == list(range(8))
    # at the checkpoint: replay resumes from it
    assert restore_delta(spark, t, 3) == 3             # no-op (present)
    with pytest.raises(DeltaProtocolError,
                       match="gaps|missing commit"):
        restore_delta(spark, t, 1)
