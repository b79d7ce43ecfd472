"""Iceberg named refs (branches/tags) + timestamp time travel
(`ext/iceberg.py`: `refs` map, `snapshot-log`, ref-protected expire).
"""

from __future__ import annotations

import json

import pytest

from tulflow_spark.ext.iceberg import (
    IcebergError,
    append_iceberg_fixture,
    expire_iceberg_snapshots,
    iceberg_refs,
    iceberg_snapshots,
    load_table_metadata,
    read_iceberg,
    snapshot_as_of,
    tag_iceberg_snapshot,
    write_iceberg_fixture,
)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)], "id long, v string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_refs_tags_and_timestamp_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    s1 = write_iceberg_fixture(spark, _df(spark, 0, 10), t)
    append_iceberg_fixture(spark, _df(spark, 10, 20), t)
    tag_iceberg_snapshot(t, "v1.0", s1)
    tag_iceberg_snapshot(t, "dev", ref_type="branch")  # current
    append_iceberg_fixture(spark, _df(spark, 20, 30), t)
    refs = iceberg_refs(t)
    assert refs["v1.0"] == {"snapshot_id": s1, "type": "tag"}
    assert refs["main"]["type"] == "branch"
    # main tracks current; tag pins; branch pins where it was created
    assert _ids(read_iceberg(spark, t, ref="main")) == list(range(30))
    assert _ids(read_iceberg(spark, t, ref="v1.0")) == list(range(10))
    assert _ids(read_iceberg(spark, t, ref="dev")) == list(range(20))
    # timestamp travel through snapshot-log
    meta = load_table_metadata(t)
    log = meta["snapshot-log"]
    assert [e["snapshot-id"] for e in log] == \
        [s["snapshot_id"] for s in iceberg_snapshots(t)]
    ts1 = log[0]["timestamp-ms"]
    assert _ids(read_iceberg(spark, t, as_of_ms=ts1)) == list(range(10))
    assert _ids(read_iceberg(
        spark, t, as_of_ms=log[-1]["timestamp-ms"] + 10 ** 6
    )) == list(range(30))
    with pytest.raises(IcebergError, match="at or before"):
        read_iceberg(spark, t, as_of_ms=ts1 - 1)
    with pytest.raises(IcebergError, match="not in table"):
        read_iceberg(spark, t, ref="nope")
    with pytest.raises(IcebergError, match="mutually exclusive"):
        read_iceberg(spark, t, ref="main", as_of_ms=ts1)
    with pytest.raises(IcebergError, match="writer-maintained"):
        tag_iceberg_snapshot(t, "main")
    with pytest.raises(IcebergError, match="not in table"):
        tag_iceberg_snapshot(t, "x", 12345)


def test_expire_protects_ref_snapshots(spark, tmp_path):
    t = str(tmp_path / "t")
    s1 = write_iceberg_fixture(spark, _df(spark, 0, 10), t)
    append_iceberg_fixture(spark, _df(spark, 10, 20), t)
    append_iceberg_fixture(spark, _df(spark, 20, 30), t)
    tag_iceberg_snapshot(t, "pin", s1)
    expire_iceberg_snapshots(spark, t, keep_last=1,
                             min_age_seconds=0.0)
    # the tagged snapshot survived the keep_last=1 window (spec rule)
    assert _ids(read_iceberg(spark, t, ref="pin")) == list(range(10))
    assert _ids(read_iceberg(spark, t)) == list(range(30))
    kept = {s["snapshot_id"] for s in iceberg_snapshots(t)}
    assert s1 in kept and len(kept) == 2
    # snapshot-log pruned consistently (no dangling entries)
    meta = load_table_metadata(t)
    assert {e["snapshot-id"] for e in meta["snapshot-log"]} <= kept


def test_foreign_refs_carry_through_commits(spark, tmp_path):
    """Refs a FOREIGN writer created must survive our commits verbatim
    (the carry-everything rule that keeps maintenance safe on tables
    this module did not write)."""
    t = str(tmp_path / "t")
    s1 = write_iceberg_fixture(spark, _df(spark, 0, 10), t)
    v = f"{t}/metadata/v1.metadata.json"
    meta = json.load(open(v))
    meta.setdefault("refs", {})["audit-2025"] = {
        "snapshot-id": s1, "type": "tag",
        "max-ref-age-ms": 999999}       # foreign-only field
    json.dump(meta, open(v, "w"))
    append_iceberg_fixture(spark, _df(spark, 10, 20), t)
    meta2 = load_table_metadata(t)
    assert meta2["refs"]["audit-2025"]["max-ref-age-ms"] == 999999
    assert _ids(read_iceberg(spark, t, ref="audit-2025")) == \
        list(range(10))
    # foreign snapshot-log with REAL epoch-ms timestamps resolves
    assert snapshot_as_of(
        {"snapshot-log": [
            {"timestamp-ms": 1700000000000, "snapshot-id": 5},
            {"timestamp-ms": 1700000100000, "snapshot-id": 9},
        ]}, 1700000050000) == 5
