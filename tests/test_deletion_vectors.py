"""ext/deletion_vectors.py: RoaringBitmapArray portable decode/encode
and the DV descriptor/file layer.

Golden strategy: hand-written byte-level serializations here in tests
(including the run-container cookie the fixture encoder never emits)
must decode exactly; encode/decode roundtrips prove the fixture path;
byte-flip fuzz proves corruption dies typed."""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np
import pytest

from tulflow_spark.ext.deletion_vectors import (
    MAGIC,
    DvError,
    decode_rbm_array,
    dv_relative_path,
    encode_rbm_array,
    read_dv,
    write_dv_file,
)


def test_roundtrip_shapes():
    cases = [
        [],
        [0],
        [0, 1, 2, 65535, 65536, 131072 + 7],
        list(range(0, 20000, 2)),                   # bitset container
        [(1 << 32) + 5, (1 << 32) + 6, (7 << 32)],  # multiple hi keys
        list(range(4096)) + [4096],                 # array/bitset edge
    ]
    for idx in cases:
        got = decode_rbm_array(encode_rbm_array(idx))
        assert list(got) == sorted(set(idx))


def test_hand_written_run_container_decodes():
    """Independent serialization: run-flagged cookie (12347), one
    container below the offset threshold, runs {10..12, 100}."""
    roaring = (
        struct.pack("<I", 12347 | (0 << 16))  # size-1=0 in upper bits
        + bytes([0x01])                        # run flag bit for c0
        + struct.pack("<HH", 0, 3)             # key 0, card-1 = 3
        + struct.pack("<H", 2)                 # 2 runs
        + struct.pack("<HH", 10, 2)            # 10..12
        + struct.pack("<HH", 100, 0)           # 100
    )
    data = struct.pack("<iq", MAGIC, 1) + struct.pack("<I", 0) + roaring
    assert list(decode_rbm_array(data)) == [10, 11, 12, 100]


def test_hand_written_no_run_cookie_with_offsets():
    """Independent no-run serialization with the mandatory offset
    header; two containers across two 16-bit keys."""
    c0 = struct.pack("<HH", 5, 9)      # array container values
    c1 = struct.pack("<H", 7)
    header = struct.pack("<II", 12346, 2)
    desc = struct.pack("<HH", 0, 1) + struct.pack("<HH", 3, 0)
    off0 = 4 + 4 + 8 + 8
    offsets = struct.pack("<II", off0, off0 + len(c0))
    roaring = header + desc + offsets + c0 + c1
    data = struct.pack("<iq", MAGIC, 1) + struct.pack("<I", 2) + roaring
    # hi key 2 → base (2<<32); containers at 16-bit keys 0 and 3
    assert list(decode_rbm_array(data)) == [
        (2 << 32) | 5, (2 << 32) | 9, (2 << 32) | (3 << 16) | 7]


def test_decode_walls():
    with pytest.raises(DvError, match="magic"):
        decode_rbm_array(struct.pack("<iq", 123, 0))
    with pytest.raises(DvError, match="shorter"):
        decode_rbm_array(b"\x00\x01")
    good = encode_rbm_array([1, 2, 3])
    with pytest.raises(DvError, match="trailing"):
        decode_rbm_array(good + b"\x00")
    with pytest.raises(DvError, match="cookie"):
        decode_rbm_array(struct.pack("<iq", MAGIC, 1)
                         + struct.pack("<I", 0)
                         + struct.pack("<I", 9999))


def test_byte_flip_fuzz_typed_or_clean():
    base = encode_rbm_array(list(range(0, 9000, 3)))
    for pos in range(0, len(base), 7):
        mutated = base[:pos] + bytes([base[pos] ^ 0xFF]) + base[pos + 1:]
        try:
            decode_rbm_array(mutated)
        except DvError:
            pass


def test_inline_descriptor():
    data = encode_rbm_array([4, 8, 15])
    dv = {"storageType": "i",
          "pathOrInlineDv": base64.b85encode(data).decode(),
          "cardinality": 3}
    assert list(read_dv("/nowhere", dv)) == [4, 8, 15]
    dv["cardinality"] = 5
    with pytest.raises(DvError, match="cardinality"):
        read_dv("/nowhere", dv)


def test_dv_file_roundtrip_and_checks(tmp_path):
    t = str(tmp_path)
    dv = write_dv_file(t, [10, 20, 30, (3 << 32) + 1])
    assert dv["storageType"] == "u"
    assert dv["cardinality"] == 4
    assert list(read_dv(t, dv)) == [10, 20, 30, (3 << 32) + 1]
    rel = dv_relative_path(dv)
    assert rel.startswith("deletion_vector_") and rel.endswith(".bin")
    # deterministic uuid (fixture stability)
    assert write_dv_file(t, [10, 20, 30, (3 << 32) + 1]) == dv
    # corrupt the stored bitmap: CRC must catch it
    p = tmp_path / rel
    raw = bytearray(p.read_bytes())
    raw[7] ^= 0xFF
    p.write_bytes(bytes(raw))
    with pytest.raises(DvError, match="checksum|truncated|cookie|magic"):
        read_dv(t, dv)
    with pytest.raises(DvError, match="unknown DV storageType"):
        read_dv(t, {"storageType": "x", "pathOrInlineDv": ""})
    with pytest.raises(DvError, match="offset"):
        read_dv(t, {"storageType": "u",
                    "pathOrInlineDv": dv["pathOrInlineDv"]})


def test_prefixed_uuid_path():
    enc = base64.b85encode(b"\x01" * 16).decode()
    rel = dv_relative_path({"storageType": "u",
                            "pathOrInlineDv": "ab/cd" + enc})
    assert rel == ("ab/cd/deletion_vector_"
                   "01010101-0101-0101-0101-010101010101.bin")
    with pytest.raises(DvError, match="base85"):
        dv_relative_path({"storageType": "u", "pathOrInlineDv": "x"})
    assert dv_relative_path({"storageType": "i",
                             "pathOrInlineDv": ""}) is None


def test_negative_index_refused():
    with pytest.raises(DvError, match="non-negative"):
        encode_rbm_array([-1, 3])
