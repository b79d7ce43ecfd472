"""ext/avro_ocf.py: dependency-free Avro object container reader/writer.

Golden strategy: a HAND-ASSEMBLED byte-level container (independent of
write_ocf) must decode exactly — pinning the reader against the Avro
1.11 spec, not against our writer."""

from __future__ import annotations

import json
import struct
import zlib

import pytest

from tulflow_spark.ext.avro_ocf import (
    AvroError,
    read_ocf,
    write_ocf,
)


def _zz(v: int) -> bytes:
    """Independent zigzag-varint encoder (spec §binary encoding)."""
    u = (v << 1) ^ (v >> 63) if v >= 0 else (((-v - 1) << 1) | 1)
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _hand_container(schema: dict, body: bytes, count: int,
                    codec: bytes = b"null",
                    sync: bytes = b"\x16" * 16) -> bytes:
    sj = json.dumps(schema).encode()
    return (
        b"Obj\x01"
        + _zz(2)
        + _zz(len(b"avro.schema")) + b"avro.schema"
        + _zz(len(sj)) + sj
        + _zz(len(b"avro.codec")) + b"avro.codec"
        + _zz(len(codec)) + codec
        + _zz(0)
        + sync
        + _zz(count) + _zz(len(body)) + body + sync
    )


SCHEMA = {"type": "record", "name": "t", "fields": [
    {"name": "a", "type": "long"},
    {"name": "b", "type": "string"},
    {"name": "u", "type": ["null", "double"]},
]}


def test_hand_assembled_container_decodes_exactly():
    body = (
        _zz(-3) + _zz(2) + b"hi" + _zz(1) + struct.pack("<d", 2.5)
        + _zz(1000000) + _zz(3) + "é!".encode() + _zz(0)
    )
    got = read_ocf(_hand_container(SCHEMA, body, 2))
    assert got == [
        {"a": -3, "b": "hi", "u": 2.5},
        {"a": 1000000, "b": "é!", "u": None},
    ]


def test_deflate_codec():
    body = _zz(7) + _zz(2) + b"ok" + _zz(0)
    comp = zlib.compress(body)[2:-4]  # raw DEFLATE (strip zlib wrapper)
    got = read_ocf(_hand_container(SCHEMA, comp, 1, codec=b"deflate"))
    assert got == [{"a": 7, "b": "ok", "u": None}]


def test_writer_roundtrips_against_reader():
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "u", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": {
            "type": "record", "name": "kv", "fields": [
                {"name": "k", "type": "string"},
                {"name": "v", "type": ["null", "bytes"]}]}}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "e", "type": {
            "type": "enum", "name": "col", "symbols": ["A", "B"]}},
        {"name": "fx", "type": {
            "type": "fixed", "name": "f4", "size": 4}},
        {"name": "fl", "type": "float"},
        {"name": "bo", "type": "boolean"},
    ]}
    recs = [
        {"s": "héllo", "n": -(2 ** 62), "u": None,
         "arr": [{"k": "x", "v": b"\x00\xff"}, {"k": "y", "v": None}],
         "m": {"a": 1, "b": -2}, "e": "B", "fx": b"\x01\x02\x03\x04",
         "fl": 0.5, "bo": True},
        {"s": "", "n": 0, "u": 42, "arr": [], "m": {}, "e": "A",
         "fx": b"ABCD", "fl": -1.5, "bo": False},
    ]
    assert read_ocf(write_ocf(schema, recs)) == recs
    assert read_ocf(write_ocf(schema, [])) == []


def test_named_type_reuse_by_reference():
    schema = {"type": "record", "name": "outer", "fields": [
        {"name": "p1", "type": {"type": "record", "name": "pt",
                                "fields": [{"name": "x",
                                            "type": "long"}]}},
        {"name": "p2", "type": "pt"},  # reference by name
    ]}
    recs = [{"p1": {"x": 1}, "p2": {"x": 2}}]
    assert read_ocf(write_ocf(schema, recs)) == recs


def test_typed_walls_and_corruption():
    with pytest.raises(AvroError, match="magic"):
        read_ocf(b"PK\x03\x04junk")
    with pytest.raises(AvroError, match="codec"):
        read_ocf(_hand_container(SCHEMA, b"", 0, codec=b"snappy"))
    blob = bytearray(write_ocf(SCHEMA, [{"a": 1, "b": "x", "u": None}]))
    blob[-1] ^= 0xFF  # corrupt trailing sync
    with pytest.raises(AvroError, match="sync"):
        read_ocf(bytes(blob))
    # truncated body
    good = write_ocf(SCHEMA, [{"a": 1, "b": "xyz", "u": None}])
    with pytest.raises(AvroError):
        read_ocf(good[:-18])
    # negative array block count carries a byte-size long (spec)
    arr_schema = {"type": "record", "name": "w", "fields": [
        {"name": "xs", "type": {"type": "array", "items": "long"}}]}
    body = _zz(-2) + _zz(2) + _zz(5) + _zz(6) + _zz(0)
    got = read_ocf(_hand_container(arr_schema, body, 1))
    assert got == [{"xs": [5, 6]}]


def test_union_branch_selected_by_type():
    schema = {"type": "record", "name": "u", "fields": [
        {"name": "x", "type": ["null", "long", "string"]}]}
    recs = [{"x": None}, {"x": 5}, {"x": "abc"}]
    assert read_ocf(write_ocf(schema, recs)) == recs
    with pytest.raises(AvroError, match="no union branch"):
        write_ocf(schema, [{"x": b"bytes"}])
    with pytest.raises(AvroError, match="no union branch"):
        write_ocf({"type": "record", "name": "n", "fields": [
            {"name": "y", "type": ["long"]}]}, [{"y": None}])


def test_byte_flip_fuzz_typed_or_clean():
    """Every single-byte corruption of a small container either raises
    AvroError or decodes cleanly — no IndexError/KeyError/Struct
    errors may escape the typed contract (one bad manifest must be a
    typed failure, never an untyped task killer)."""
    good = write_ocf(SCHEMA, [
        {"a": 7, "b": "hello", "u": 2.5},
        {"a": -1, "b": "", "u": None},
    ])
    bad_kinds = []
    for i in range(len(good)):
        for flip in (0x01, 0x80, 0xFF):
            blob = bytearray(good)
            blob[i] ^= flip
            try:
                read_ocf(bytes(blob))
            except AvroError:
                pass
            except MemoryError:
                pass    # absurd declared lengths may pre-allocate
            except Exception as exc:   # noqa: BLE001
                bad_kinds.append((i, flip, type(exc).__name__,
                                  str(exc)[:60]))
    assert not bad_kinds, bad_kinds[:5]


def test_zero_byte_datum_count_bounded():
    """A block header claiming a huge record count over a ZERO-byte
    datum schema (empty record) must raise typed instead of appending
    until memory exhausts — the truncation check never fires when the
    datum consumes nothing."""
    import pytest as _pytest

    from tulflow_spark.ext.avro_ocf import AvroError, read_ocf, write_ocf

    schema = {"type": "record", "name": "empty", "fields": []}
    blob = write_ocf(schema, [{}])
    assert read_ocf(blob) == [{}]           # count == 1: legit
    # craft count = 2^40 over the same empty block
    evil = write_ocf(schema, [{}])
    # the single-record block encodes count=1 size=0 after the header;
    # rewrite that block's count varint (sync is the 16 bytes before)
    body = bytearray(evil)
    # locate the final block: ...sync | count | size | block | sync
    # for one empty record: count=\x02 (zigzag 1), size=\x00
    idx = len(body) - 16 - 2   # [count][size] before trailing sync
    assert body[idx] == 0x02 and body[idx + 1] == 0x00
    big = bytearray()
    n = (1 << 40) << 1         # zigzag-positive
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            big.append(b | 0x80)
        else:
            big.append(b)
            break
    body[idx:idx + 1] = big
    with _pytest.raises(AvroError, match="zero-byte"):
        read_ocf(bytes(body))


def test_many_empty_records_stay_readable():
    """Review finding (r12): conformant blocks of MANY zero-byte
    records (count>1, size=0) must still decode — the DoS bound only
    rejects counts past the 64Ki sanity limit."""
    from tulflow_spark.ext.avro_ocf import read_ocf, write_ocf

    schema = {"type": "record", "name": "empty", "fields": []}
    blob = write_ocf(schema, [{}] * 5)
    assert read_ocf(blob) == [{}] * 5
