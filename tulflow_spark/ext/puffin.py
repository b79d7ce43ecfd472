"""Puffin file format: the Iceberg sidecar container for index and
statistics blobs, and — since format v3 — for DELETION VECTORS.

Spec (public, iceberg.apache.org/puffin-spec): a Puffin file is

    Magic | Blob_1 ... Blob_n | Footer

with ``Magic = b"PFA1"`` and the footer laid out BACKWARDS from the
end of the file:

    Magic | FooterPayload (UTF-8 JSON) | PayloadSize (4B LE int)
          | Flags (4B) | Magic

The payload JSON lists every blob: ``{"blobs": [{"type", "fields",
"snapshot-id", "sequence-number", "offset", "length",
"compression-codec"?, "properties"?}, ...], "properties"?: {...}}``.

Deletion-vector blobs (type ``deletion-vector-v1``, Iceberg table-spec
v3 "Deletion vectors") are deliberately BIT-COMPATIBLE with Delta
Lake's DV payload: ``[len 4B BE][vector][crc32 4B BE]`` where
``vector`` is the portable 64-bit RoaringBitmapArray serialization —
whose own leading magic ``1681511377`` (LE) is exactly the byte
sequence ``D1 D3 39 64`` the Iceberg spec names.  This module
therefore reuses :func:`tulflow_spark.ext.deletion_vectors
.encode_rbm_array` / ``decode_rbm_array`` (the Delta codec) for the
vector itself and only adds the container framing.

No compression library ships in this container, so a footer whose
compression flag is set, or a blob carrying ``compression-codec``,
raises the typed :class:`PuffinError` — never a silent misread.

Reference parity: the reference library has no lake format at all
(`/root/reference/tulflow/process.py` moves whole XML files on S3);
this module is part of the 100 TB storage-layer extension surface.
"""
from __future__ import annotations

import json
import struct
import zlib

import numpy as np

from tulflow_spark import fsio
from tulflow_spark.ext.deletion_vectors import (
    DvError,
    decode_rbm_array,
    encode_rbm_array,
)

MAGIC = b"PFA1"
DV_BLOB_TYPE = "deletion-vector-v1"

# one puffin file is metadata-sized (DV bitmaps are KBs..MBs); anything
# past this bound is read refusal, not an allocation attempt
_MAX_FOOTER_PAYLOAD = 64 << 20


class PuffinError(ValueError):
    """Typed wall for malformed / unsupported Puffin content."""


def read_footer(raw: bytes) -> dict:
    """Parse a whole Puffin file's footer → the payload dict.

    Validates both magics, the payload size, and the flag bytes;
    refuses compressed footers typed (no codec in-container)."""
    if len(raw) < 4 + 4 + 4 + 4 + 4:
        raise PuffinError(f"file too short for a footer ({len(raw)}B)")
    if raw[:4] != MAGIC:
        raise PuffinError(f"bad leading magic {raw[:4]!r}")
    if raw[-4:] != MAGIC:
        raise PuffinError(f"bad trailing magic {raw[-4:]!r}")
    flags = raw[-8:-4]
    if flags[0] & 0x01:
        raise PuffinError(
            "footer payload is compressed (lz4) — no codec in this "
            "container; write uncompressed footers")
    if flags[0] & 0xFE or any(flags[1:]):
        raise PuffinError(f"reserved footer flag bits set: {flags!r}")
    (psize,) = struct.unpack_from("<i", raw, len(raw) - 12)
    if psize < 2 or psize > min(_MAX_FOOTER_PAYLOAD, len(raw)):
        raise PuffinError(f"implausible footer payload size {psize}")
    pstart = len(raw) - 12 - psize
    if pstart < 8 or raw[pstart - 4:pstart] != MAGIC:
        raise PuffinError("footer payload does not start after a magic")
    try:
        payload = json.loads(raw[pstart:pstart + psize].decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as exc:
        raise PuffinError(f"bad footer payload JSON: {exc}") from None
    if not isinstance(payload, dict) or \
            not isinstance(payload.get("blobs"), list):
        raise PuffinError("footer payload has no blobs list")
    for b in payload["blobs"]:
        if not isinstance(b, dict):
            raise PuffinError("non-object blob entry in footer")
        for k in ("type", "offset", "length"):
            if k not in b:
                raise PuffinError(f"blob entry missing {k!r}")
        off, ln = int(b["offset"]), int(b["length"])
        if off < 4 or ln < 0 or off + ln > pstart - 4:
            raise PuffinError(
                f"blob span [{off}, {off + ln}) outside the data "
                f"region [4, {pstart - 4})")
    return payload


def decode_dv_blob(raw: bytes, offset: int, length: int) -> np.ndarray:
    """One ``deletion-vector-v1`` blob span → sorted int64 deleted row
    positions.  Layout (table-spec v3): 4B BE length of the vector,
    the portable RoaringBitmapArray bytes (leading magic D1 D3 39 64),
    4B BE CRC-32 of the vector."""
    if offset < 0 or length < 12 or offset + length > len(raw):
        raise PuffinError(
            f"DV blob span [{offset}, {offset + length}) outside file "
            f"of {len(raw)}B")
    (vlen,) = struct.unpack_from(">I", raw, offset)
    if 4 + vlen + 4 != length:
        raise PuffinError(
            f"DV blob length field {vlen} inconsistent with blob "
            f"span {length} (want span == 4 + len + 4)")
    vec = raw[offset + 4:offset + 4 + vlen]
    (crc,) = struct.unpack_from(">I", raw, offset + 4 + vlen)
    if crc != zlib.crc32(vec):
        raise PuffinError("DV blob CRC mismatch")
    try:
        return decode_rbm_array(vec)
    except DvError as exc:
        raise PuffinError(f"DV bitmap: {exc}") from None


def encode_dv_blob(positions) -> bytes:
    """Row positions → ``deletion-vector-v1`` blob bytes (fixture
    writer; deterministic — no clock, no randomness)."""
    vec = encode_rbm_array(positions)
    return struct.pack(">I", len(vec)) + vec + \
        struct.pack(">I", zlib.crc32(vec))


def read_dv(path: str, offset: int, length: int,
            cardinality: int | None = None) -> np.ndarray:
    """Read ONE deletion vector out of a Puffin file by its manifest
    coordinates (``content_offset`` / ``content_size_in_bytes``).

    Trusts the coordinates (they are what the manifest committed) but
    verifies the blob's own length field and CRC — and, when the
    caller knows the manifest ``record_count``, the cardinality."""
    fs, lp = fsio.resolve(path)
    try:
        with fs.open_input_stream(lp) as stream:
            raw = stream.read()
    except OSError as exc:
        raise PuffinError(f"cannot read Puffin file {path!r}: {exc}") \
            from None
    if raw[:4] != MAGIC:
        raise PuffinError(f"{path!r} is not a Puffin file")
    out = decode_dv_blob(raw, offset, length)
    if cardinality is not None and int(cardinality) != len(out):
        raise PuffinError(
            f"DV cardinality {len(out)} != manifest {cardinality}")
    return out


def write_dv_file(path: str, dvs: dict[str, "np.ndarray | list[int]"],
                  snapshot_id: int = 0,
                  sequence_number: int = 0) -> dict[str, dict]:
    """Fixture writer: one Puffin file holding one deletion-vector
    blob per referenced data file.

    A value may be row positions (encoded here) or a PRE-ENCODED
    ``(roaring_vector_bytes, cardinality)`` tuple — the executor-side
    bitmap-aggregation path ships vectors, and re-decoding them on the
    driver just to re-encode would defeat it; the blob CRC is computed
    here either way.

    Returns ``{referenced_data_file: {"offset", "length",
    "cardinality"}}`` — exactly the coordinates a v3 manifest entry
    needs.  Deterministic bytes for fixed input (archived fixtures
    must be byte-stable)."""
    if not dvs:
        raise PuffinError("refusing to write a Puffin file with no DVs")
    body = bytearray(MAGIC)
    blobs: list[dict] = []
    coords: dict[str, dict] = {}
    for ref in sorted(dvs):
        val = dvs[ref]
        if isinstance(val, tuple) and len(val) == 2 \
                and isinstance(val[0], (bytes, bytearray)):
            vec, card = bytes(val[0]), int(val[1])
            blob = struct.pack(">I", len(vec)) + vec + \
                struct.pack(">I", zlib.crc32(vec))
        else:
            blob = encode_dv_blob(val)
            card = int(len(decode_rbm_array(
                blob[4:-4])))  # post-dedup cardinality, not len(input)
        off = len(body)
        body += blob
        blobs.append({
            "type": DV_BLOB_TYPE,
            "fields": [],
            "snapshot-id": int(snapshot_id),
            "sequence-number": int(sequence_number),
            "offset": off,
            "length": len(blob),
            "properties": {"referenced-data-file": ref,
                           "cardinality": str(card)},
        })
        coords[ref] = {"offset": off, "length": len(blob),
                       "cardinality": card}
    payload = json.dumps({"blobs": blobs},
                         sort_keys=True).encode("utf-8")
    body += MAGIC + payload + struct.pack("<i", len(payload)) + \
        b"\x00\x00\x00\x00" + MAGIC
    fs, lp = fsio.resolve(path)
    parent = lp.rsplit("/", 1)[0]
    fs.create_dir(parent, recursive=True)
    with fs.open_output_stream(lp) as stream:
        stream.write(bytes(body))
    return coords


__all__ = ["DV_BLOB_TYPE", "MAGIC", "PuffinError", "decode_dv_blob",
           "encode_dv_blob", "read_dv", "read_footer", "write_dv_file"]
