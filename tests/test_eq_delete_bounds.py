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


def test_null_eq_delete_values_never_pruned(spark, tmp_path):
    """Soundness (r15): a NULL delete value null-safe-matches file
    NULLs, which min/max bounds cannot see.  Our own merge writer
    refuses NULL keys outright, so the hazard is the FOREIGN shape —
    a Flink-style eq-delete file carrying {NULL, 999}: naive bounds
    (999, 999) would prune the [0,4]-range file holding the NULL
    victim and resurrect it at conversion.  The value-bounds path
    disables a column on any null, and _manifest_value_bounds
    honors a foreign entry's null_value_counts."""
    from tulflow_spark.ext.iceberg import (
        convert_eq_deletes_iceberg,
        delete_equality_iceberg_fixture,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"x{i}") for i in range(5)] + [(None, "nv")],
        "id long, v string").coalesce(1)
    write_iceberg_fixture(spark, df, t)
    delete_equality_iceberg_fixture(
        spark, t, [{"id": None}, {"id": 999}], ["id"])
    expect = sorted((i, f"x{i}") for i in range(5))
    got = sorted((r["id"], r["v"]) for r in
                 read_iceberg(spark, t).collect())
    assert got == expect                    # NULL victim is dead
    # conversion must materialize the NULL victim, not resurrect it
    assert convert_eq_deletes_iceberg(spark, t) is not None
    got2 = sorted((r["id"], r["v"]) for r in
                  read_iceberg(spark, t).collect())
    assert got2 == expect


def test_manifest_value_bounds_null_count_rules():
    """Proof-or-no-prune (r15 review): a column prunes ONLY with a
    recorded zero null count (our stage path writes explicit zeros
    behind every bound it publishes); absent, positive, or
    unparseable counts disable it, as do float/double types (NaN is
    invisible to bounds but TRUE under eqNullSafe)."""
    from tulflow_spark.ext.iceberg import _encode_bound

    ent = {
        "lower_bounds": [{"key": 1, "value": _encode_bound(10,
                                                           "long")}],
        "upper_bounds": [{"key": 1, "value": _encode_bound(99,
                                                           "long")}],
    }
    # bounds without a recorded count: no proof, never prune
    assert _manifest_value_bounds(ent, [1], ["long"]) == [None]
    ent["null_value_counts"] = [{"key": 1, "value": 0}]
    assert _manifest_value_bounds(ent, [1], ["long"]) == [(10, 99)]
    ent["null_value_counts"] = [{"key": 1, "value": 3}]
    assert _manifest_value_bounds(ent, [1], ["long"]) == [None]
    ent["null_value_counts"] = [{"key": 1, "value": None}]
    assert _manifest_value_bounds(ent, [1], ["long"]) == [None]
    # dict-shaped maps (the hand-authored-table tolerance) work too
    ent["null_value_counts"] = {1: 0}
    assert _manifest_value_bounds(ent, [1], ["long"]) == [(10, 99)]
    # float/double never prune even with a zero count
    fent = {
        "lower_bounds": [{"key": 1, "value": _encode_bound(1.5,
                                                           "double")}],
        "upper_bounds": [{"key": 1, "value": _encode_bound(2.5,
                                                           "double")}],
        "null_value_counts": [{"key": 1, "value": 0}],
    }
    assert _manifest_value_bounds(fent, [1], ["double"]) == [None]
