"""Delta MERGE writer (`ext/delta_log.py::merge_delta`): keyed I/U/D
copy-on-write commits with full-fidelity Change Data Feed staging —
update_preimage/update_postimage pairs, inserts, deletes — plus the
typed validation walls and the untouched-files-carry-by-reference
scale property."""

from __future__ import annotations

import json
import os

import pytest

from tulflow_spark.ext.delta_log import (
    DeltaConcurrentCommit,
    DeltaProtocolError,
    _replay,
    latest_version,
    merge_delta,
    read_delta,
    read_delta_cdf,
    write_delta,
)

CDF = {"delta.enableChangeDataFeed": "true"}


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def _chg(spark, rows):
    return spark.createDataFrame(rows, "id long, v string, op string")


def _feed(df):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in df.collect())


def _state(spark, t):
    return sorted((r["id"], r["v"])
                  for r in read_delta(spark, t).collect())


def test_merge_basic_and_cdf_images(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t,
                mode="append", configuration=CDF)
    v = merge_delta(spark, t, _chg(spark, [
        (2, "B", "U"),          # update existing
        (4, "d", "I"),          # insert new
        (3, None, "D"),         # delete existing
        (9, None, "D"),         # delete missing → no-op
        (5, "e", "U"),          # upsert on missing key → insert
    ]), keys=["id"])
    assert v == 1
    assert _state(spark, t) == [(1, "a"), (2, "B"), (4, "d"), (5, "e")]
    assert _feed(read_delta_cdf(spark, t, 0)) == [
        (1, "delete", 3, "c"),
        (1, "insert", 4, "d"),
        (1, "insert", 5, "e"),
        (1, "update_postimage", 2, "B"),
        (1, "update_preimage", 2, "b"),
    ]


def test_merge_rewrites_only_matched_files(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(i, f"x{i}") for i in range(5)]), t,
                mode="append")
    write_delta(_df(spark, [(i, f"x{i}") for i in range(5, 10)]), t,
                mode="append")
    before = set(_replay(spark, t, 1).live)
    v = merge_delta(spark, t, _chg(spark, [(7, "Y", "U")]), keys=["id"])
    after = _replay(spark, t, v)
    # the add(s) of commit 0 (ids 0-4, unmatched) carry by reference
    v0_adds = {p for p in before if p.startswith("commit-")
               and p in after.live}
    assert v0_adds, "unmatched files must survive untouched"
    # exactly the matched file(s) were tombstoned
    acts = [json.loads(ln) for ln in open(
        f"{t}/_delta_log/{v:020d}.json") if ln.strip()]
    removed = [a["remove"]["path"] for a in acts if a.get("remove")]
    assert set(removed) <= before and removed
    assert _state(spark, t) == sorted(
        [(i, f"x{i}") for i in range(10) if i != 7] + [(7, "Y")])


def test_merge_multirow_key_collapses_to_delete_insert(spark, tmp_path):
    """A key holding SEVERAL base rows collapses under upsert
    semantics; the feed records each old row as delete + the change
    row as insert (pre/post images only pair 1:1)."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a1"), (2, "b")]), t, mode="append",
                configuration=CDF)
    write_delta(_df(spark, [(1, "a2")]), t, mode="append")
    v = merge_delta(spark, t, _chg(spark, [(1, "A", "U")]),
                    keys=["id"])
    assert _state(spark, t) == [(1, "A"), (2, "b")]
    assert _feed(read_delta_cdf(spark, t, v - 1, v)) == [
        (v, "delete", 1, "a1"),
        (v, "delete", 1, "a2"),
        (v, "insert", 1, "A"),
    ]


def test_merge_partitioned_cdc_partition_values(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"x{i}", i % 2) for i in range(8)],
        "id long, v string, g long")
    write_delta(df, t, mode="append", partition_by=["g"],
                configuration=CDF)
    chg = spark.createDataFrame(
        [(3, "Y", 1, "U"), (20, "z", 0, "I"), (4, None, 0, "D")],
        "id long, v string, g long, op string")
    v = merge_delta(spark, t, chg, keys=["id"])
    got = sorted((r["id"], r["v"], r["g"])
                 for r in read_delta(spark, t).collect())
    want = sorted([(i, f"x{i}", i % 2) for i in range(8)
                   if i not in (3, 4)] + [(3, "Y", 1), (20, "z", 0)])
    assert got == want
    feed = read_delta_cdf(spark, t, v - 1, v)
    rows = sorted((r["_change_type"], r["id"], r["g"])
                  for r in feed.collect())
    assert rows == [("delete", 4, 0), ("insert", 20, 0),
                    ("update_postimage", 3, 1),
                    ("update_preimage", 3, 1)]
    # cdc actions record partitionValues; the cdc files live under
    # _change_data and never materialize the partition column twice
    acts = [json.loads(ln) for ln in open(
        f"{t}/_delta_log/{v:020d}.json") if ln.strip()]
    cdc = [a["cdc"] for a in acts if a.get("cdc")]
    assert cdc and all("g" in c["partitionValues"] for c in cdc)


def test_merge_validation_walls(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t, mode="append")
    with pytest.raises(DeltaProtocolError, match="duplicate keys"):
        merge_delta(spark, t, _chg(spark, [(1, "x", "U"),
                                           (1, "y", "U")]), ["id"])
    with pytest.raises(DeltaProtocolError, match="I/U/D"):
        merge_delta(spark, t, _chg(spark, [(1, "x", "upsert")]),
                    ["id"])
    with pytest.raises(DeltaProtocolError, match="NULL merge keys"):
        merge_delta(spark, t, _chg(spark, [(None, "x", "U")]), ["id"])
    with pytest.raises(DeltaProtocolError, match="missing columns"):
        merge_delta(spark, t, spark.createDataFrame(
            [(1, "U")], "id long, op string"), ["id"])
    with pytest.raises(DeltaProtocolError, match="types differ"):
        merge_delta(spark, t, spark.createDataFrame(
            [(1, 2, "U")], "id long, v long, op string"), ["id"])
    with pytest.raises(DeltaProtocolError, match="table columns"):
        merge_delta(spark, t, _chg(spark, [(1, "x", "U")]), ["nope"])
    with pytest.raises(DeltaProtocolError, match="collides"):
        merge_delta(spark, t, _chg(spark, [(1, "x", "U")]), ["id"],
                    op_col="v")
    with pytest.raises(DeltaConcurrentCommit, match="re-read"):
        merge_delta(spark, t, _chg(spark, [(1, "x", "U")]), ["id"],
                    expect_version=7)
    with pytest.raises(DeltaProtocolError, match="no delta table"):
        merge_delta(spark, str(tmp_path / "none"),
                    _chg(spark, [(1, "x", "U")]), ["id"])
    # no-op shapes return the current version without a commit
    assert merge_delta(spark, t, _chg(spark, []), ["id"]) == 0
    assert merge_delta(spark, t, _chg(spark, [(9, None, "D")]),
                       ["id"]) == 0
    assert latest_version(t) == 0


def test_merge_append_only_wall(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t, mode="append",
                configuration={"delta.appendOnly": "true"})
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        merge_delta(spark, t, _chg(spark, [(1, "x", "U")]), ["id"])


def test_merge_without_cdf_walls_the_feed(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t, mode="append")
    v = merge_delta(spark, t, _chg(spark, [(1, "A", "U")]), ["id"])
    assert _state(spark, t) == [(1, "A"), (2, "b")]
    with pytest.raises(DeltaProtocolError, match="rewrites files"):
        read_delta_cdf(spark, t, v - 1, v).collect()


def test_foreign_cdc_update_images_replay(spark, tmp_path):
    """A FOREIGN (hand-written) cdc commit carrying update images
    replays identically through read_delta_cdf — the writer-agnostic
    half of the CDF contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t, mode="append",
                configuration=CDF)
    os.makedirs(f"{t}/_change_data", exist_ok=True)
    fp = f"{t}/_change_data/cdc-foreign.parquet"
    pq.write_table(pa.table({
        "id": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array(["a", "A", "b"]),
        "_change_type": pa.array(
            ["update_preimage", "update_postimage", "delete"]),
    }), fp)
    with open(f"{t}/_delta_log/{1:020d}.json", "w") as fh:
        fh.write(json.dumps({"cdc": {
            "path": "_change_data/cdc-foreign.parquet",
            "partitionValues": {},
            "size": os.path.getsize(fp),
            "dataChange": False}}) + "\n")
    assert _feed(read_delta_cdf(spark, t, 0)) == [
        (1, "delete", 2, "b"),
        (1, "update_postimage", 1, "A"),
        (1, "update_preimage", 1, "a"),
    ]


def test_merge_then_feed_windows_compose(spark, tmp_path):
    """Feed windows across merge + append + delete commits stay
    per-version exact."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t, mode="append",
                configuration=CDF)
    merge_delta(spark, t, _chg(spark, [(1, "A", "U")]), ["id"])   # v1
    write_delta(_df(spark, [(3, "c")]), t, mode="append")          # v2
    merge_delta(spark, t, _chg(spark, [(3, None, "D")]), ["id"])   # v3
    assert _state(spark, t) == [(1, "A"), (2, "b")]
    assert _feed(read_delta_cdf(spark, t, 1, 3)) == [
        (2, "insert", 3, "c"),
        (3, "delete", 3, "c"),
    ]
    full = _feed(read_delta_cdf(spark, t, -1))
    assert full[:2] == [(0, "insert", 1, "a"), (0, "insert", 2, "b")]
    assert len(full) == 6


def test_update_where_basic_and_cdf(spark, tmp_path):
    from tulflow_spark.ext.delta_log import update_where

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t,
                mode="append", configuration=CDF)
    v = update_where(spark, t, "id >= 2",
                     {"v": "concat(v, '!')"})
    assert v == 1
    assert _state(spark, t) == [(1, "a"), (2, "b!"), (3, "c!")]
    assert _feed(read_delta_cdf(spark, t, 0)) == [
        (1, "update_postimage", 2, "b!"),
        (1, "update_postimage", 3, "c!"),
        (1, "update_preimage", 2, "b"),
        (1, "update_preimage", 3, "c"),
    ]


def test_update_where_set_sees_preimage_row(spark, tmp_path):
    """All SET expressions evaluate against the PRE-update row (SQL
    UPDATE semantics): an expression referencing another updated
    column sees its OLD value."""
    from tulflow_spark.ext.delta_log import update_where

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t, mode="append")
    update_where(spark, t, "id = 1",
                 {"id": "id + 100", "v": "concat(v, id)"})
    assert _state(spark, t) == [(101, "a1")]


def test_update_where_partition_column_moves_rows(spark, tmp_path):
    from tulflow_spark.ext.delta_log import update_where

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"x{i}", i % 2) for i in range(6)],
        "id long, v string, g long")
    write_delta(df, t, mode="append", partition_by=["g"],
                configuration=CDF)
    v = update_where(spark, t, "id = 4", {"g": "g + 10"})
    got = sorted((r["id"], r["g"])
                 for r in read_delta(spark, t).collect())
    assert got == [(0, 0), (1, 1), (2, 0), (3, 1), (4, 10), (5, 1)]
    feed = read_delta_cdf(spark, t, v - 1, v)
    rows = sorted((r["_change_type"], r["id"], r["g"])
                  for r in feed.collect())
    assert rows == [("update_postimage", 4, 10),
                    ("update_preimage", 4, 0)]
    # the moved row lives under its NEW hive dir
    import glob as _g

    assert any("g=10" in p for p in
               _g.glob(f"{t}/commit-*/g=*/*.parquet"))


def test_update_where_rewrites_only_matched_files(spark, tmp_path):
    from tulflow_spark.ext.delta_log import update_where

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(i, f"x{i}") for i in range(5)]), t,
                mode="append")
    write_delta(_df(spark, [(i, f"x{i}") for i in range(5, 10)]), t,
                mode="append")
    before = set(_replay(spark, t, 1).live)
    v = update_where(spark, t, "id = 7", {"v": "'Y'"})
    after = _replay(spark, t, v)
    assert any(p in after.live for p in before), \
        "unmatched files must carry over by reference"
    acts = [json.loads(ln) for ln in open(
        f"{t}/_delta_log/{v:020d}.json") if ln.strip()]
    assert len([a for a in acts if a.get("remove")]) < len(before)
    assert _state(spark, t) == sorted(
        [(i, f"x{i}") for i in range(10) if i != 7] + [(7, "Y")])


def test_update_where_walls_and_noops(spark, tmp_path):
    from tulflow_spark.ext.delta_log import update_where

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, None)]), t, mode="append")
    # NULL-predicate rows are keepers, not victims
    update_where(spark, t, "v = 'zzz'", {"v": "'hit'"})
    assert latest_version(t) == 0                 # nothing matched
    update_where(spark, t, "length(v) > 90", {"v": "'hit'"})
    assert latest_version(t) == 0
    with pytest.raises(DeltaProtocolError, match="unknown columns"):
        update_where(spark, t, "id = 1", {"nope": "'x'"})
    with pytest.raises(DeltaProtocolError, match="needs set_exprs"):
        update_where(spark, t, "id = 1", {})
    with pytest.raises(DeltaConcurrentCommit, match="re-read"):
        update_where(spark, t, "id = 1", {"v": "'x'"},
                     expect_version=9)
    t2 = str(tmp_path / "t2")
    write_delta(_df(spark, [(1, "a")]), t2, mode="append",
                configuration={"delta.appendOnly": "true"})
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        update_where(spark, t2, "id = 1", {"v": "'x'"})
    # without CDF, the rewrite commit stays underivable for the feed
    v = update_where(spark, t, "id = 1", {"v": "'A'"})
    with pytest.raises(DeltaProtocolError, match="rewrites files"):
        read_delta_cdf(spark, t, v - 1, v).collect()


def test_update_where_nondeterministic_set_stays_consistent(
        spark, tmp_path):
    """r13 verdict nit: the post-update projection feeds both the cdc
    postimage and the data-file stage — a non-deterministic SET
    expression (rand()) must stage the SAME values in both (one
    evaluation, snapshotted), or a CDF consumer desyncs from the
    table."""
    from tulflow_spark.ext.delta_log import update_where

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(i, "x") for i in range(1, 9)]), t,
                mode="append", configuration=CDF)
    v = update_where(
        spark, t, "id >= 3",
        {"v": "cast(cast(rand() * 1e18 as long) as string)"})
    state = dict(_state(spark, t))
    post = {i: val for _, c, i, val in
            _feed(read_delta_cdf(spark, t, 0, v))
            if c == "update_postimage"}
    assert set(post) == set(range(3, 9))
    for i, val in post.items():
        assert state[i] == val, \
            f"postimage for id={i} desynced from committed row"


def test_merge_evolve_schema_new_column(spark, tmp_path):
    """r13 verdict missing #5: a MERGE carrying a NEW nullable column
    with evolve_schema=True widens the metaData in the same commit —
    old rows read null, the feed carries the widened schema; the
    default still projects extra columns away."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t,
                mode="append", configuration=CDF)
    chg = spark.createDataFrame(
        [(2, "B", 7, "U"), (4, "d", 9, "I")],
        "id long, v string, w long, op string")
    # default: extra column ignored, no schema change
    v1 = merge_delta(spark, t, chg, keys=["id"])
    assert read_delta(spark, t).columns == ["id", "v"]
    # evolved: w lands as a nullable column in the same commit
    chg2 = spark.createDataFrame(
        [(3, "C", 11, "U"), (5, "e", 13, "I")],
        "id long, v string, w long, op string")
    v2 = merge_delta(spark, t, chg2, keys=["id"],
                     evolve_schema=True)
    got = sorted((r["id"], r["v"], r["w"])
                 for r in read_delta(spark, t).collect())
    assert got == [(1, "a", None), (2, "B", None), (3, "C", 11),
                   (4, "d", None), (5, "e", 13)]
    # time travel below the merge never sees the column
    assert read_delta(spark, t, version=v1).columns == ["id", "v"]
    # the feed carries the widened schema at the merge version
    feed = read_delta_cdf(spark, t, v2 - 1, v2)
    rows = sorted((r["_change_type"], r["id"], r["w"])
                  for r in feed.collect())
    assert rows == [
        ("insert", 5, 13),
        ("update_postimage", 3, 11),
        ("update_preimage", 3, None),
    ]
    # type changes still refuse, evolved or not
    bad = spark.createDataFrame([(1, 5, 1, "U")],
                                "id long, v long, w long, op string")
    with pytest.raises(DeltaProtocolError, match="types differ"):
        merge_delta(spark, t, bad, keys=["id"], evolve_schema=True)
    # case-variant new columns refuse
    bad2 = spark.createDataFrame(
        [(1, "x", 1, 1, 2, "U")],
        "id long, v string, w long, q long, Q long, op string")
    with pytest.raises(DeltaProtocolError, match="case"):
        merge_delta(spark, t, bad2, keys=["id"], evolve_schema=True)
