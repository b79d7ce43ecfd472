"""Iceberg format v3: Puffin deletion vectors (`ext/puffin.py` +
`ext/iceberg.py` v3 paths).

Golden strategy mirrors the v1/v2 suite: a HAND-ASSEMBLED Puffin byte
golden pins the container framing against the public Puffin spec
(magic/footer layout, blob JSON) independent of the writer, and the
DV blob bytes are pinned against the Delta RoaringBitmapArray codec
they are spec-defined to be bit-compatible with."""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np
import pytest

from tulflow_spark.ext import puffin
from tulflow_spark.ext.deletion_vectors import encode_rbm_array
from tulflow_spark.ext.iceberg import (
    IcebergError,
    _live_files,
    append_iceberg_fixture,
    delete_positions_iceberg_fixture,
    delete_positions_iceberg_v3,
    delete_equality_iceberg_fixture,
    iceberg_snapshots,
    load_table_metadata,
    read_iceberg,
    rewrite_iceberg_data_files,
    upgrade_iceberg_v3,
    write_iceberg_fixture,
)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}", i % 3) for i in range(lo, hi)],
        "id long, v string, b long",
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _file_ids(path: str) -> dict[str, list[int]]:
    import pyarrow.parquet as pq

    meta = load_table_metadata(path)
    files, _ = _live_files(meta, None)
    return {d["file_path"]:
            pq.read_table(d["file_path"][7:],
                          columns=["id"]).column("id").to_pylist()
            for d in files}


# -- puffin container ---------------------------------------------------


def test_puffin_hand_assembled_golden(tmp_path):
    """A Puffin file assembled from raw spec bytes (NOT the writer)
    must parse: magic, blob region, footer magic/payload/size/flags."""
    vec = encode_rbm_array([1, 5, 9])
    blob = struct.pack(">I", len(vec)) + vec + \
        struct.pack(">I", zlib.crc32(vec))
    payload = json.dumps({"blobs": [{
        "type": "deletion-vector-v1", "fields": [],
        "snapshot-id": 7, "sequence-number": 2,
        "offset": 4, "length": len(blob),
        "properties": {"referenced-data-file": "f.parquet",
                       "cardinality": "3"},
    }]}).encode()
    raw = (b"PFA1" + blob + b"PFA1" + payload
           + struct.pack("<i", len(payload))
           + b"\x00\x00\x00\x00" + b"PFA1")
    foot = puffin.read_footer(raw)
    (b,) = foot["blobs"]
    assert b["properties"]["referenced-data-file"] == "f.parquet"
    got = puffin.decode_dv_blob(raw, b["offset"], b["length"])
    assert got.tolist() == [1, 5, 9]


def test_puffin_writer_reader_roundtrip(tmp_path):
    p = str(tmp_path / "dv.puffin")
    coords = puffin.write_dv_file(
        p, {"a.parquet": [3, 1, 3], "b.parquet": [0]},
        snapshot_id=9, sequence_number=4)
    assert coords["a.parquet"]["cardinality"] == 2   # dedup counted
    got = puffin.read_dv(p, coords["a.parquet"]["offset"],
                         coords["a.parquet"]["length"],
                         cardinality=2)
    assert got.tolist() == [1, 3]
    raw = open(p, "rb").read()
    foot = puffin.read_footer(raw)
    assert {b["properties"]["referenced-data-file"]
            for b in foot["blobs"]} == {"a.parquet", "b.parquet"}
    assert all(b["snapshot-id"] == 9 and b["sequence-number"] == 4
               for b in foot["blobs"])


def test_puffin_typed_walls(tmp_path):
    p = str(tmp_path / "dv.puffin")
    puffin.write_dv_file(p, {"a": [1]})
    raw = bytearray(open(p, "rb").read())
    with pytest.raises(puffin.PuffinError, match="trailing magic"):
        puffin.read_footer(bytes(raw[:-1]) + b"X")
    with pytest.raises(puffin.PuffinError, match="leading magic"):
        puffin.read_footer(b"XXXX" + bytes(raw[4:]))
    # compressed-footer flag bit → typed (no codec in container)
    flagged = bytearray(raw)
    flagged[-8] |= 0x01
    with pytest.raises(puffin.PuffinError, match="compressed"):
        puffin.read_footer(bytes(flagged))
    # reserved flag bits → typed
    flagged = bytearray(raw)
    flagged[-7] |= 0x40
    with pytest.raises(puffin.PuffinError, match="reserved"):
        puffin.read_footer(bytes(flagged))
    # blob CRC flip → typed
    foot = puffin.read_footer(bytes(raw))
    (b,) = foot["blobs"]
    bad = bytearray(raw)
    bad[b["offset"] + 5] ^= 0xFF
    with pytest.raises(puffin.PuffinError):
        puffin.decode_dv_blob(bytes(bad), b["offset"], b["length"])
    # cardinality mismatch → typed
    with pytest.raises(puffin.PuffinError, match="cardinality"):
        puffin.read_dv(p, b["offset"], b["length"], cardinality=5)


def test_puffin_byte_flip_fuzz(tmp_path):
    """Every single-byte corruption must raise typed or decode the
    original positions — never a silent wrong answer."""
    p = str(tmp_path / "dv.puffin")
    coords = puffin.write_dv_file(p, {"f": list(range(0, 64, 3))})
    raw = open(p, "rb").read()
    want = list(range(0, 64, 3))
    c = coords["f"]
    for i in range(len(raw)):
        bad = bytearray(raw)
        bad[i] ^= 0x5A
        try:
            foot = puffin.read_footer(bytes(bad))
            (b,) = foot["blobs"]
            got = puffin.decode_dv_blob(
                bytes(bad), int(b["offset"]), int(b["length"]))
            assert got.tolist() == want, f"silent misread at byte {i}"
        except (puffin.PuffinError, KeyError, TypeError, ValueError):
            pass        # typed refusal is the contract
    # and via the manifest-coordinate reader
    got = puffin.read_dv(p, c["offset"], c["length"],
                         cardinality=c["cardinality"])
    assert got.tolist() == want


# -- v3 table flows -----------------------------------------------------


def test_upgrade_and_dv_delete_merge(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 30), t,
                          partition_by=["b"])
    s1 = iceberg_snapshots(t)[0]["snapshot_id"]
    assert upgrade_iceberg_v3(t) == 2
    meta = load_table_metadata(t)
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 0
    fids = _file_ids(t)
    fp = sorted(fids)[0]
    kill = [0, 1]
    delete_positions_iceberg_v3(spark, t, {fp: kill})
    gone = {fids[fp][i] for i in kill}
    assert _ids(read_iceberg(spark, t)) == sorted(
        set(range(30)) - gone)
    # merge: re-delete overlapping + new position → ONE DV survives
    delete_positions_iceberg_v3(spark, t, {fp: [1, 2]})
    gone |= {fids[fp][2]}
    assert _ids(read_iceberg(spark, t)) == sorted(
        set(range(30)) - gone)
    _, dels = _live_files(load_table_metadata(t), None)
    dvs = [d for d in dels if d["file_format"] == "PUFFIN"]
    assert len(dvs) == 1 and dvs[0]["record_count"] == 3
    # time travel below the deletes still sees everything
    assert _ids(read_iceberg(spark, t, snapshot_id=s1)) == list(range(30))


def test_v3_walls(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 12), t)
    fp = sorted(_file_ids(t))[0]
    # DV delete on a v2 table → typed
    with pytest.raises(IcebergError, match="format-version 3"):
        delete_positions_iceberg_v3(spark, t, {fp: [0]})
    # upgrade blocked while position-delete FILES are live
    delete_positions_iceberg_fixture(spark, t, {fp: [0]})
    with pytest.raises(IcebergError, match="position-delete"):
        upgrade_iceberg_v3(t)
    # rewrite pays the debt, then upgrade goes through
    rewrite_iceberg_data_files(spark, t, min_files=1)
    upgrade_iceberg_v3(t)
    assert load_table_metadata(t)["format-version"] == 3
    # v2 position-delete writer refuses on v3
    fp3 = sorted(_file_ids(t))[0]
    with pytest.raises(IcebergError, match="forbid"):
        delete_positions_iceberg_fixture(spark, t, {fp3: [0]})
    # out-of-range position → typed (would commit an unreadable DV)
    with pytest.raises(IcebergError, match="outside"):
        delete_positions_iceberg_v3(spark, t, {fp3: [10 ** 9]})
    # non-live target → typed
    with pytest.raises(IcebergError, match="not live"):
        delete_positions_iceberg_v3(spark, t, {"file:///nope": [0]})
    # empty maps → typed
    with pytest.raises(IcebergError, match="empty"):
        delete_positions_iceberg_v3(spark, t, {})
    with pytest.raises(IcebergError, match="empty"):
        delete_positions_iceberg_v3(spark, t, {fp3: []})


def test_v3_append_rewrite_lineage_and_expire(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 20), t)
    upgrade_iceberg_v3(t)
    fids = _file_ids(t)
    fp = sorted(fids)[0]
    delete_positions_iceberg_v3(spark, t, {fp: [0]})
    append_iceberg_fixture(spark, _df(spark, 20, 30), t)
    meta = load_table_metadata(t)
    # row-lineage high-water mark: delete added 0 rows, append 10
    assert meta["next-row-id"] == 10
    by_seq = sorted(meta["snapshots"],
                    key=lambda s: s["sequence-number"])
    assert by_seq[-1]["first-row-id"] == 0
    want = sorted(set(range(30)) - {fids[fp][0]})
    assert _ids(read_iceberg(spark, t)) == want
    # rewrite compacts the DV away; reads stay identical
    assert rewrite_iceberg_data_files(spark, t, min_files=1) is not None
    _, dels = _live_files(load_table_metadata(t), None)
    assert dels == []
    assert _ids(read_iceberg(spark, t)) == want
    # expire + orphan cleanup reclaims the old puffin file
    from tulflow_spark.ext.iceberg import expire_iceberg_snapshots

    removed = expire_iceberg_snapshots(spark, t, keep_last=1,
                                       min_age_seconds=0.0)
    assert any(r.endswith(".puffin") for r in removed)
    assert _ids(read_iceberg(spark, t)) == want


def test_v3_dv_with_equality_deletes(spark, tmp_path):
    """DVs (position semantics) and equality deletes (sequence
    semantics) compose on one v3 table."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 20), t)
    upgrade_iceberg_v3(t)
    fids = _file_ids(t)
    fp = sorted(fids)[0]
    delete_positions_iceberg_v3(spark, t, {fp: [0]})
    delete_equality_iceberg_fixture(spark, t, [{"id": 7}], ["id"])
    gone = {fids[fp][0], 7}
    assert _ids(read_iceberg(spark, t)) == sorted(
        set(range(20)) - gone)
    # rows appended AFTER the equality delete survive it; the DV
    # still applies to its referenced file
    append_iceberg_fixture(
        spark, spark.createDataFrame([(7, "again", 1)],
                                     "id long, v string, b long"), t)
    assert _ids(read_iceberg(spark, t)) == sorted(
        (set(range(20)) - gone) | {7})


def test_two_dvs_for_one_file_typed(spark, tmp_path):
    """The reader enforces the spec's at-most-one-DV-per-file rule
    even when a (non-conformant) writer produced two."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 10), t)
    upgrade_iceberg_v3(t)
    fp = sorted(_file_ids(t))[0]
    delete_positions_iceberg_v3(spark, t, {fp: [0]})
    meta = load_table_metadata(t)
    _, dels = _live_files(meta, None)
    (dv,) = [d for d in dels if d["file_format"] == "PUFFIN"]
    from tulflow_spark.ext.iceberg import _dv_positions_frame

    with pytest.raises(IcebergError, match="at most one"):
        _dv_positions_frame(spark, [dict(dv), dict(dv)])


def test_dv_on_orc_table_reads(spark, tmp_path):
    """r13 (was a typed wall through r12): deletion vectors on ORC
    data files apply through the Arrow-indexed ORC scan — Spark's ORC
    reader has no _metadata.row_index, so referenced files scan one
    per task with per-stripe row numbering."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 10), t,
                          file_format="orc")
    upgrade_iceberg_v3(t)
    meta = load_table_metadata(t)
    files, _ = _live_files(meta, None)
    fp = files[0]["file_path"]
    import pyarrow.orc as po

    first_ids = po.ORCFile(fp[7:]).read().column("id").to_pylist()
    delete_positions_iceberg_v3(spark, t, {fp: [0, 2]})
    got = _ids(read_iceberg(spark, t))
    assert got == sorted(set(range(10))
                         - {first_ids[0], first_ids[2]})


def test_time_travel_below_upgrade_keeps_v2_deletes(spark, tmp_path):
    """r12 review finding 1: upgrading to v3 must NOT wall off valid
    pre-upgrade history — a snapshot written under v2 with position
    delete FILES stays readable (and its deletes stay applied) after
    the upgrade; only the LIVE state forbids them."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 12), t)
    fids = _file_ids(t)
    fp = sorted(fids)[0]
    delete_positions_iceberg_fixture(spark, t, {fp: [0]})
    want_v2 = sorted(set(range(12)) - {fids[fp][0]})
    snaps = iceberg_snapshots(t)
    s_del = snaps[-1]["snapshot_id"]
    rewrite_iceberg_data_files(spark, t, min_files=1)
    upgrade_iceberg_v3(t)
    assert _ids(read_iceberg(spark, t)) == want_v2
    # the pre-rewrite snapshot still reads, deletes applied
    assert _ids(read_iceberg(spark, t, snapshot_id=s_del)) == want_v2


def test_delete_files_live_in_delete_manifests(spark, tmp_path):
    """r12 review finding 2: every manifest holding delete entries
    must be flagged content=1 in the manifest list (conformant
    readers plan deletes only from delete manifests), and data
    entries must never appear in one."""
    from tulflow_spark.ext.iceberg import (
        _manifest_entries,
        _read_manifest,
        _snapshot,
    )

    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 12), t,
                          partition_by=["b"])
    upgrade_iceberg_v3(t)
    fids = _file_ids(t)
    fp = sorted(fids)[0]
    delete_positions_iceberg_v3(spark, t, {fp: [0, 1]})
    meta = load_table_metadata(t)
    snap = _snapshot(meta, None)
    seen_delete_manifest = False
    for mf in _manifest_entries(snap):
        _, entries = _read_manifest(mf)
        contents = {int((e.get("data_file") or {}).get("content") or 0)
                    for e in entries}
        if int(mf.get("content") or 0) == 1:
            assert contents <= {1, 2}, "data entry in a delete manifest"
            seen_delete_manifest = True
        else:
            assert contents == {0}, "delete entry in a data manifest"
    assert seen_delete_manifest
    # and the DV entry carries its referenced file's partition
    _, dels = _live_files(meta, None)
    (dv,) = [d for d in dels if d["file_format"] == "PUFFIN"]
    ref_part = next(d for d in _live_files(meta, None)[0]
                    if d["file_path"] == fp)["partition"]
    assert dv["partition"] == ref_part != {}


def test_v3_dv_byte_flip_never_misreads(spark, tmp_path):
    """Corrupting the committed Puffin file must never change the
    READ result silently: every flip is typed or harmless."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 12), t)
    upgrade_iceberg_v3(t)
    fids = _file_ids(t)
    fp = sorted(fids)[0]
    delete_positions_iceberg_v3(spark, t, {fp: [0, 2]})
    want = sorted(set(range(12)) - {fids[fp][0], fids[fp][2]})
    assert _ids(read_iceberg(spark, t)) == want
    meta = load_table_metadata(t)
    _, dels = _live_files(meta, None)
    (dv,) = [d for d in dels if d["file_format"] == "PUFFIN"]
    ppath = dv["file_path"][7:]
    raw = open(ppath, "rb").read()
    rng = np.random.default_rng(7)
    for i in sorted(rng.choice(len(raw), size=min(40, len(raw)),
                               replace=False)):
        bad = bytearray(raw)
        bad[i] ^= 0xA5
        with open(ppath, "wb") as fh:
            fh.write(bytes(bad))
        try:
            got = _ids(read_iceberg(spark, t))
            assert got == want, f"silent misread at byte {i}"
        except IcebergError:
            pass
    with open(ppath, "wb") as fh:
        fh.write(raw)
    assert _ids(read_iceberg(spark, t)) == want


def test_v3_pos_delete_wall_is_addressing_independent(spark, tmp_path):
    """r12 ADVICE 1: the v3 'no live position-delete files' wall fires
    for the CURRENT state however it is addressed — implicit, explicit
    snapshot id, ref='main', or a timestamp resolving to the head —
    while historical snapshots stay readable.  Foreign-table shape: a
    v2 table with a live position-delete file whose metadata claims
    format-version 3 (our own upgrade refuses this state)."""
    t = str(tmp_path / "t")
    write_iceberg_fixture(spark, _df(spark, 0, 12), t)
    clean_snap = iceberg_snapshots(t)[-1]["snapshot_id"]
    fp = sorted(_file_ids(t))[0]
    delete_positions_iceberg_fixture(spark, t, {fp: [0]})
    # foreign upgrade: bump format-version in place, leaving the live
    # position-delete file behind
    hint = open(f"{t}/metadata/version-hint.text").read().strip()
    mpath = f"{t}/metadata/v{hint}.metadata.json"
    meta = json.loads(open(mpath).read())
    meta["format-version"] = 3
    with open(mpath, "w") as fh:
        fh.write(json.dumps(meta))
    cur = iceberg_snapshots(t)[-1]["snapshot_id"]
    ts_head = max(s["timestamp_ms"] for s in iceberg_snapshots(t))
    for kwargs in ({}, {"snapshot_id": cur}, {"ref": "main"},
                   {"as_of_ms": ts_head}):
        with pytest.raises(IcebergError, match="position-delete"):
            read_iceberg(spark, t, **kwargs).collect()
    # history below the head stays readable
    assert _ids(read_iceberg(spark, t, snapshot_id=clean_snap)) == \
        list(range(12))


def test_snapshot_as_of_empty_history_message():
    """r12 ADVICE 4: a table with no snapshots raises a clear typed
    message, not 'history starts at None'."""
    from tulflow_spark.ext.iceberg import snapshot_as_of

    with pytest.raises(IcebergError, match="no snapshot history"):
        snapshot_as_of({"snapshot-log": [], "snapshots": []}, 10)


def test_v3_wide_delete_collects_only_bitmaps(spark, tmp_path,
                                              monkeypatch):
    """r14 VERDICT #3: the v3 delete_where path must not collect a row
    per matched position — a wide DELETE (>=1e5 matched rows across
    two files) ships one roaring-bitmap row per touched data file to
    the driver, and the committed state still reads exactly."""
    try:    # Spark 4: instances are classic.DataFrame, not the ABC
        from pyspark.sql.classic import dataframe as _psql
    except ImportError:
        import pyspark.sql.dataframe as _psql

    from tulflow_spark.ext.iceberg import delete_where_iceberg

    t = str(tmp_path / "t")
    n = 120_000
    half = (spark.range(n // 2)
            .selectExpr("id", "CAST(id AS STRING) AS v")
            .coalesce(1).sortWithinPartitions("id"))
    other = (spark.range(n // 2, n)
             .selectExpr("id", "CAST(id AS STRING) AS v")
             .coalesce(1).sortWithinPartitions("id"))
    write_iceberg_fixture(spark, half, t)
    append_iceberg_fixture(spark, other, t)
    upgrade_iceberg_v3(t)
    meta = load_table_metadata(t)
    n_files = len(_live_files(meta, None)[0])
    assert n_files >= 2
    orig = _psql.DataFrame.collect
    sizes: list[int] = []

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(_psql.DataFrame, "collect", spy)
    delete_where_iceberg(spark, t, "id % 3 <> 0")   # kills 2/3 = 80k
    monkeypatch.setattr(_psql.DataFrame, "collect", orig)
    # every driver-side collect during the delete is bounded by the
    # data-file count (bitmap rows + scalar validation aggregates) —
    # never one row per matched position
    assert sizes, "expected at least the bitmap collect"
    assert max(sizes) <= n_files + 4
    got = sorted(r["id"] for r in read_iceberg(spark, t).collect())
    assert got == [i for i in range(n) if i % 3 == 0]
    # the DV survives a further merge-with-prior on the same files
    delete_where_iceberg(spark, t, "id % 2 = 0 AND id % 3 = 0")
    got = sorted(r["id"] for r in read_iceberg(spark, t).collect())
    assert got == [i for i in range(n) if i % 3 == 0 and i % 2]
