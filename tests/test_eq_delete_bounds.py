"""r15: equality-delete manifest entries carry the delete VALUES'
column bounds (spec: delete files record lower/upper_bounds like data
files), so planners prune candidate data files — or skip reading the
delete parquet entirely — from metadata alone."""

from __future__ import annotations

from tulflow_spark.ext.iceberg import (
    _bounds_pruned,
    _current_schema,
    _live_files,
    _manifest_value_bounds,
    append_iceberg_fixture,
    load_table_metadata,
    merge_iceberg,
    read_iceberg,
    write_iceberg_fixture,
)


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)], "id long, v string")


def test_eq_delete_manifest_bounds_enable_pruning(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _mk(spark, 0, 50), t)
    append_iceberg_fixture(spark, _mk(spark, 1000, 1050), t)
    ch = spark.createDataFrame(
        [(k, f"u{k}", "U") for k in range(1000, 1010)],
        "id long, v string, op string").coalesce(1)
    merge_iceberg(spark, t, ch, ["id"])

    meta = load_table_metadata(t)
    data, dels = _live_files(meta, None)
    eq = [d for d in dels if int(d.get("content") or 0) == 2]
    assert eq
    # every staged eq entry records its values' bounds
    assert all(d.get("lower_bounds") and d.get("upper_bounds")
               for d in eq)
    fid = next(int(f["id"]) for f in _current_schema(meta)["fields"]
               if f["name"] == "id")
    mvb = _manifest_value_bounds(eq[0], [fid], ["long"])
    assert mvb == [(1000, 1009)]
    # the [0,50) file is provably disjoint from the delete range and
    # prunes; the [1000,1050) file does not
    pruned = [d for d in data
              if _bounds_pruned(d, fid, "long", 1000, 1009)]
    assert len(pruned) == 1
    # string columns never prune (spec allows truncated bounds)
    vfid = next(int(f["id"]) for f in _current_schema(meta)["fields"]
                if f["name"] == "v")
    assert _manifest_value_bounds(eq[0], [vfid],
                                  ["string"]) == [None]
    # foreign entries without bounds fall back cleanly
    bare = dict(eq[0])
    bare.pop("lower_bounds"), bare.pop("upper_bounds")
    assert _manifest_value_bounds(bare, [fid], ["long"]) is None
    # end-to-end semantics unchanged: exactly the merge keys updated
    got = {r["id"]: r["v"] for r in read_iceberg(spark, t).collect()}
    assert got[1000] == "u1000" and got[1009] == "u1009"
    assert got[0] == "x0" and got[1010] == "x1010"
    assert len(got) == 100
