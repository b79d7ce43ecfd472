"""Dependency-free Apache Avro Object Container File reader/writer.

Iceberg's metadata layer (manifest lists, manifest files) is Avro; the
container has no avro library, so this is a from-spec implementation of
the 1.11 specification's binary encoding + object container format —
the same protocol-re-implementation move as ``ext/onnx_mini.py`` and
``ext/delta_log.py`` (reference parity: the reference reads external
feeds with whatever parser fits, e.g. tulflow `harvest.py`; here the
"feed" is the Iceberg metadata layer).

Scope (everything Iceberg metadata needs, nothing more):

- reading decodes with the WRITER schema embedded in the file header —
  no reader-schema resolution (callers pick fields by name from the
  decoded dicts, which is robust across Iceberg spec versions);
- codecs ``null`` and ``deflate`` (raw DEFLATE via stdlib zlib);
  anything else (snappy, zstandard) raises :class:`AvroError` typed;
- logical types are returned as their underlying primitives;
- the writer emits codec ``null`` only (fixtures don't need smaller).

All decode errors raise :class:`AvroError` — one malformed manifest
must produce a typed failure, never a silent misread.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


class AvroError(ValueError):
    """Typed failure for malformed Avro bytes or unsupported features."""


# ---------------------------------------------------------------------------
# binary decoding
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError(
                f"truncated: need {n} bytes at {self.pos}, "
                f"have {len(self.buf) - self.pos}"
            )
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        """Zigzag varint (int and long share the wire format)."""
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroError("varint longer than 10 bytes")
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        n = self.long()
        if n < 0:
            raise AvroError(f"negative bytes length {n}")
        return self.read(n)

    def string(self) -> str:
        try:
            return self.bytes_().decode("utf-8")
        except UnicodeDecodeError as exc:
            raise AvroError(f"bad utf-8 in string: {exc}") from None



def _req(schema: dict, key: str):
    """Typed access to a required schema key — corrupted embedded
    schema JSON must raise AvroError, not KeyError (byte-flip fuzz)."""
    try:
        return schema[key]
    except KeyError:
        raise AvroError(f"schema missing {key!r}: {schema!r}"[:200]) \
            from None


def _decode(r: _Reader, schema, names: dict):
    """One datum of ``schema`` (parsed JSON) from ``r``."""
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _decode(r, names[t], names)
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1)[0] != 0
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.bytes_()
        if t == "string":
            return r.string()
        raise AvroError(f"unknown type {t!r}")
    if isinstance(schema, list):  # union: branch index, then datum
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union branch {idx} of {len(schema)}")
        return _decode(r, schema[idx], names)
    t = schema.get("type")
    if t == "record":
        _register(schema, names)
        out = {}
        for f in _req(schema, "fields"):
            if not isinstance(f, dict):
                raise AvroError(f"malformed record field {f!r}"[:120])
            out[_req(f, "name")] = _decode(r, _req(f, "type"), names)
        return out
    if t == "enum":
        _register(schema, names)
        idx = r.long()
        syms = _req(schema, "symbols")
        if not 0 <= idx < len(syms):
            raise AvroError(f"enum index {idx} of {len(syms)}")
        return syms[idx]
    if t == "fixed":
        _register(schema, names)
        return r.read(int(_req(schema, "size")))
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # negative count: block byte-size follows
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode(r, _req(schema, "items"), names))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.string()
                out[k] = _decode(r, _req(schema, "values"), names)
    if isinstance(t, (str, list, dict)):
        # {"type": "long", "logicalType": ...} wrapper — decode the
        # underlying type; logical interpretation is the caller's
        return _decode(r, t, names)
    raise AvroError(f"unsupported schema {schema!r}")


def _register(schema: dict, names: dict) -> None:
    name = schema.get("name")
    if name:
        ns = schema.get("namespace")
        names[name] = schema
        if ns:
            names[f"{ns}.{name}"] = schema


def _collect_names(schema, names: dict) -> None:
    """Pre-register named types so forward references by name resolve."""
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        _register(schema, names)
    if t == "record":
        for f in schema.get("fields", []):
            _collect_names(f.get("type"), names)
    elif t == "array":
        _collect_names(schema.get("items"), names)
    elif t == "map":
        _collect_names(schema.get("values"), names)
    elif isinstance(t, (list, dict)):
        _collect_names(t, names)


def read_ocf(data: bytes) -> list:
    """All records of one object container file, decoded with the
    embedded writer schema (records → dicts keyed by field name)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise AvroError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.string()
            meta[k] = r.bytes_()
    sync = r.read(16)
    try:
        codec = meta.get("avro.codec", b"null").decode("utf-8")
    except UnicodeDecodeError as exc:
        raise AvroError(f"bad codec bytes: {exc}") from None
    if codec not in ("null", "deflate"):
        raise AvroError(f"codec {codec!r} not supported (null/deflate)")
    try:
        schema = json.loads(meta["avro.schema"])
    except KeyError:
        raise AvroError("header missing avro.schema") from None
    except ValueError as exc:
        raise AvroError(f"bad avro.schema JSON: {exc}") from None
    names: dict = {}
    _collect_names(schema, names)
    out = []
    zero_advance = 0
    while r.pos < len(r.buf):
        count = r.long()
        size = r.long()
        if count < 0 or size < 0:
            raise AvroError(f"bad block header ({count}, {size})")
        block = r.read(size)
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch (corrupt block)")
        if codec == "deflate":
            try:
                block = zlib.decompress(block, -15)
            except zlib.error as exc:
                raise AvroError(f"bad deflate block: {exc}") from None
        br = _Reader(block)
        for _ in range(count):
            before = br.pos
            out.append(_decode(br, schema, names))
            if br.pos == before:
                # a zero-byte datum (e.g. an empty record) never
                # advances the reader, so the truncation check can't
                # bound the loop: trusting crafted counts would append
                # until memory exhausts instead of failing typed.  The
                # bound is on the FILE-WIDE total (a per-block bound
                # re-opens the hole via repeated ~20-byte blocks);
                # conformant files with many empty records stay
                # readable below the 64Ki sanity limit.
                zero_advance += 1
                if zero_advance > (1 << 16):
                    raise AvroError(
                        "more than 65536 zero-byte records "
                        "(malformed block headers)")
        if br.pos != len(block):
            raise AvroError(
                f"block has {len(block) - br.pos} trailing bytes"
            )
    return out


# ---------------------------------------------------------------------------
# binary encoding (fixture writer: codec null)
# ---------------------------------------------------------------------------


class _Writer:
    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self.out.write(b)

    def long(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1) | 1
        # equivalent zigzag for negatives: standard formula below
        v &= (1 << 64) - 1
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.write(bytes([b | 0x80]))
            else:
                self.write(bytes([b]))
                return

    def bytes_(self, b: bytes) -> None:
        self.long(len(b))
        self.write(b)

    def string(self, s: str) -> None:
        self.bytes_(s.encode("utf-8"))


def _branch_accepts(schema, datum, names: dict) -> bool:
    """Writer-side union branch selection by datum TYPE — encoding a
    str through a 'long' branch (or vice versa) would silently corrupt
    the stream or raise an untyped ValueError."""
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, str):
        return {
            "null": datum is None,
            "boolean": isinstance(datum, bool),
            "int": isinstance(datum, int) and not isinstance(datum, bool),
            "long": isinstance(datum, int) and not isinstance(datum, bool),
            "float": isinstance(datum, float),
            "double": isinstance(datum, float),
            "bytes": isinstance(datum, (bytes, bytearray)),
            "string": isinstance(datum, str),
        }.get(schema, False)
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "map"):
            return isinstance(datum, dict)
        if t == "array":
            return isinstance(datum, list)
        if t == "enum":
            return isinstance(datum, str)
        if t == "fixed":
            return isinstance(datum, (bytes, bytearray))
        if isinstance(t, (str, dict, list)):
            return _branch_accepts(t, datum, names)
    return False


def _encode(w: _Writer, schema, datum, names: dict) -> None:
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _encode(w, names[t], datum, names)
        if t == "null":
            return None
        if t == "boolean":
            return w.write(b"\x01" if datum else b"\x00")
        if t in ("int", "long"):
            return w.long(int(datum))
        if t == "float":
            return w.write(struct.pack("<f", float(datum)))
        if t == "double":
            return w.write(struct.pack("<d", float(datum)))
        if t == "bytes":
            return w.bytes_(bytes(datum))
        if t == "string":
            return w.string(str(datum))
        raise AvroError(f"unknown type {t!r}")
    if isinstance(schema, list):
        # union: first branch whose TYPE accepts the datum
        for i, s in enumerate(schema):
            if _branch_accepts(s, datum, names):
                w.long(i)
                return _encode(w, s, datum, names)
        raise AvroError(
            f"no union branch of {schema!r} accepts "
            f"{type(datum).__name__}")
    t = schema.get("type")
    if t == "record":
        _register(schema, names)
        for f in _req(schema, "fields"):
            if f["name"] not in datum and not isinstance(f["type"], list):
                raise AvroError(f"record missing field {f['name']!r}")
            _encode(w, f["type"], datum.get(f["name"]), names)
        return None
    if t == "enum":
        _register(schema, names)
        return w.long(_req(schema, "symbols").index(datum))
    if t == "fixed":
        _register(schema, names)
        if len(datum) != int(_req(schema, "size")):
            raise AvroError("fixed size mismatch")
        return w.write(bytes(datum))
    if t == "array":
        if datum:
            w.long(len(datum))
            for item in datum:
                _encode(w, _req(schema, "items"), item, names)
        w.long(0)
        return None
    if t == "map":
        if datum:
            w.long(len(datum))
            for k, v in datum.items():
                w.string(k)
                _encode(w, _req(schema, "values"), v, names)
        w.long(0)
        return None
    if isinstance(t, (str, list, dict)):
        return _encode(w, t, datum, names)
    raise AvroError(f"unsupported schema {schema!r}")


def write_ocf(schema: dict | str | list, records: list,
              sync: bytes = b"\x00" * 16) -> bytes:
    """One object container file (codec null), for manifest fixtures."""
    if len(sync) != 16:
        raise AvroError("sync marker must be 16 bytes")
    names: dict = {}
    _collect_names(schema, names)
    w = _Writer()
    w.write(MAGIC)
    w.long(2)
    w.string("avro.schema")
    w.bytes_(json.dumps(schema).encode("utf-8"))
    w.string("avro.codec")
    w.bytes_(b"null")
    w.long(0)
    w.write(sync)
    if records:
        body = _Writer()
        for rec in records:
            _encode(body, schema, rec, names)
        data = body.out.getvalue()
        w.long(len(records))
        w.long(len(data))
        w.write(data)
        w.write(sync)
    return w.out.getvalue()
