"""WARC / WET container ingestion (ISO 28500; Common Crawl's layout).

The reference's source shape is a paged container walked into a record
stream (tulflow reference: harvest.py:126-150 — OAI pages → records);
the 100 TB-corpus analog is a WARC archive — gzip with ONE MEMBER PER
RECORD in Common Crawl, so members can be decoded independently —
walked into typed records.  Spark shape: ``binaryFile`` scan →
``mapInPandas`` record walk (Arrow-batched, chunked yields so a 1 GB
archive never materializes as one pandas frame), the tarball-source
pattern (`sources/tarball.py`).  Archive-level failures surface as an
``error`` side-output column, never an exception — one bad archive
cannot kill a 100 TB ingest.

Record grammar (WARC/1.0, ISO 28500 §4): a version line, named headers
(continuation lines folded per the grammar), an empty line, exactly
``Content-Length`` block bytes, two CRLFs.  Stdlib ``gzip`` reads
multi-member streams transparently, so the per-record-member layout
needs no special casing.  Trailing-bytes tolerance follows the repo's
stream-decoder rule: malformed bytes at record 0 raise typed
(:class:`WarcFormatError`); after ≥1 good record a sync loss is a clean
stop (``tolerant=True``) so junk trailers can't kill a pass.

``encode_warc`` is the production fixture encoder (the mm*/media
strategy): tests and the driver-gated pair build archives with it and
prove the PRODUCTION walker/HTTP parser against analytic expectations;
an independent byte-level writer in tests guards against the encoder
and decoder sharing a bug.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from collections.abc import Iterable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class WarcFormatError(ValueError):
    """Typed malformed-WARC/HTTP error (the repo's typed-wall family)."""


@dataclass(frozen=True)
class WarcRecord:
    """One parsed record: the raw header map (names lowercased) plus
    the exact block bytes."""

    version: str
    headers: dict[str, str]
    block: bytes

    @property
    def warc_type(self) -> str | None:
        return self.headers.get("warc-type")

    @property
    def record_id(self) -> str | None:
        return self.headers.get("warc-record-id")

    @property
    def target_uri(self) -> str | None:
        return self.headers.get("warc-target-uri")

    @property
    def warc_date(self) -> str | None:
        return self.headers.get("warc-date")

    @property
    def content_type(self) -> str | None:
        return self.headers.get("content-type")


def _open_stream(data: bytes | bytearray | memoryview | io.IOBase):
    if isinstance(data, (bytes, bytearray, memoryview)):
        raw = bytes(data)
        if raw[:2] == b"\x1f\x8b":
            return gzip.GzipFile(fileobj=io.BytesIO(raw))
        return io.BytesIO(raw)
    return data


def iter_warc_records(
    data: bytes | bytearray | memoryview | io.IOBase,
    tolerant: bool = True,
) -> Iterator[WarcRecord]:
    """Walk a WARC archive (plain or gzip, single- or multi-member)
    into :class:`WarcRecord`\\ s.  Malformed bytes before the first
    good record raise :class:`WarcFormatError`; afterwards
    ``tolerant=True`` (default) treats a sync loss as end-of-archive
    — the stream-decoder trailing-bytes rule."""
    stream = _open_stream(data)
    n_good = 0
    while True:
        try:
            line = stream.readline()
            while line in (b"\r\n", b"\n"):
                line = stream.readline()
            if not line:
                return
            if not line.startswith(b"WARC/"):
                raise WarcFormatError(
                    f"expected a WARC version line, got {line[:40]!r}"
                )
            version = line.strip().decode("ascii", "replace")
            headers: dict[str, str] = {}
            last: str | None = None
            while True:
                line = stream.readline()
                if not line:
                    raise WarcFormatError("EOF inside record headers")
                if line in (b"\r\n", b"\n"):
                    break
                if line[:1] in (b" ", b"\t"):
                    # folded continuation line (ISO 28500 header grammar)
                    if last is None:
                        raise WarcFormatError(
                            "continuation line before any header"
                        )
                    headers[last] += " " + line.strip().decode(
                        "utf-8", "replace")
                    continue
                name, sep, value = line.partition(b":")
                if not sep:
                    raise WarcFormatError(
                        f"malformed header line {line[:40]!r}"
                    )
                last = name.strip().decode("ascii", "replace").lower()
                headers[last] = value.strip().decode("utf-8", "replace")
            raw_len = headers.get("content-length")
            if raw_len is None:
                raise WarcFormatError("record missing Content-Length")
            try:
                length = int(raw_len)
            except ValueError:
                raise WarcFormatError(
                    f"bad Content-Length {raw_len!r}"
                ) from None
            if length < 0:
                raise WarcFormatError(f"negative Content-Length {length}")
            block = stream.read(length)
            if len(block) != length:
                raise WarcFormatError(
                    f"block truncated: wanted {length} bytes, "
                    f"got {len(block)}"
                )
        except WarcFormatError:
            if tolerant and n_good:
                return
            raise
        except (OSError, EOFError, zlib.error) as exc:
            # a truncated/corrupt gzip member surfaces here
            if tolerant and n_good:
                return
            raise WarcFormatError(f"corrupt archive: {exc}") from None
        n_good += 1
        yield WarcRecord(version=version, headers=headers, block=block)


def encode_warc(
    records: Iterable[dict],
    gzip_per_record: bool = True,
) -> bytes:
    """Production fixture encoder: record dicts → WARC/1.0 archive
    bytes, one gzip member per record when ``gzip_per_record`` (the
    Common Crawl layout; ``False`` writes a plain uncompressed WARC).

    Each record dict: ``warc_type`` (required), ``block`` (bytes,
    required), optional ``uri``, ``date``, ``content_type``,
    ``record_id``, ``extra_headers`` (list of (name, value)).  Record
    ids default to a DETERMINISTIC content-derived urn:uuid so fixture
    archives are byte-stable across runs (no clock, no randomness)."""
    out = bytearray()
    for rec in records:
        block = rec["block"]
        if not isinstance(block, (bytes, bytearray)):
            raise TypeError("record block must be bytes")
        rid = rec.get("record_id")
        if rid is None:
            h = hashlib.md5(bytes(block)).hexdigest()
            rid = (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-"
                   f"{h[16:20]}-{h[20:32]}>")
        headers: list[tuple[str, str]] = [
            ("WARC-Type", rec["warc_type"]),
            ("WARC-Record-ID", rid),
            ("WARC-Date", rec.get("date", "2024-01-01T00:00:00Z")),
        ]
        if rec.get("uri") is not None:
            headers.append(("WARC-Target-URI", rec["uri"]))
        if rec.get("content_type") is not None:
            headers.append(("Content-Type", rec["content_type"]))
        headers.extend(rec.get("extra_headers", ()))
        headers.append(("Content-Length", str(len(block))))
        head = b"WARC/1.0\r\n" + b"".join(
            f"{n}: {v}\r\n".encode() for n, v in headers
        ) + b"\r\n"
        member = head + bytes(block) + b"\r\n\r\n"
        if gzip_per_record:
            out += gzip.compress(member, mtime=0)
        else:
            out += member
    return bytes(out)


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer coding (RFC 9112 §7.1)."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise WarcFormatError("chunked body: missing size line")
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise WarcFormatError(
                f"chunked body: bad size line {size_tok[:20]!r}"
            ) from None
        pos = nl + 2
        if size == 0:
            return bytes(out)  # trailer section ignored
        if pos + size > len(body):
            raise WarcFormatError("chunked body: chunk truncated")
        out += body[pos:pos + size]
        pos += size
        if body[pos:pos + 2] != b"\r\n":
            raise WarcFormatError("chunked body: missing chunk CRLF")
        pos += 2


def parse_http_response(
    block: bytes, decode_content: bool = True,
) -> tuple[int, dict[str, str], bytes]:
    """A ``response`` record's block — a raw HTTP/1.x response — →
    (status, headers, payload bytes).  ``decode_content`` undoes
    ``Transfer-Encoding: chunked`` and ``Content-Encoding:
    gzip/deflate`` (what a crawler stored is the wire form; analysis
    wants the entity).  Typed :class:`WarcFormatError` on non-HTTP
    blocks — callers at the DataFrame layer route it to the ``error``
    column, never an exception."""
    sep = block.find(b"\r\n\r\n")
    eol = b"\r\n"
    if sep < 0:
        sep = block.find(b"\n\n")
        eol = b"\n"
        if sep < 0:
            raise WarcFormatError("no header/body separator in block")
        body = block[sep + 2:]
    else:
        body = block[sep + 4:]
    head_lines = block[:sep].split(eol)
    status_line = head_lines[0]
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcFormatError(
            f"not an HTTP response: {status_line[:40]!r}"
        )
    try:
        status = int(parts[1])
    except ValueError:
        raise WarcFormatError(
            f"bad HTTP status {parts[1][:10]!r}"
        ) from None
    headers: dict[str, str] = {}
    for hl in head_lines[1:]:
        name, s, value = hl.partition(b":")
        if not s:
            continue  # lenient: crawled servers emit junk header lines
        headers[name.strip().decode("ascii", "replace").lower()] = \
            value.strip().decode("utf-8", "replace")
    if decode_content:
        if "chunked" in headers.get("transfer-encoding", "").lower():
            body = _dechunk(body)
        enc = headers.get("content-encoding", "").lower()
        if enc in ("gzip", "x-gzip"):
            try:
                body = gzip.decompress(body)
            except (OSError, EOFError, zlib.error) as exc:
                raise WarcFormatError(
                    f"bad gzip entity: {exc}"
                ) from None
        elif enc == "deflate":
            try:
                body = zlib.decompress(body)
            except zlib.error:
                try:  # some servers send raw-deflate (no zlib wrapper)
                    body = zlib.decompress(body, -15)
                except zlib.error as exc:
                    raise WarcFormatError(
                        f"bad deflate entity: {exc}"
                    ) from None
    return status, headers, body


WARC_SCHEMA = (
    "src_file string, rec_seq bigint, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, content_length bigint, block binary, "
    "error string"
)

_YIELD_EVERY = 512  # rows per pandas chunk: bounds per-batch memory


def records_from_bytes(src_file: str, raw: bytes) -> Iterator[dict]:
    """One archive's bytes → row dicts (shared by the batch reader and
    tests).  A malformed-at-record-0 archive yields a single error
    row."""
    seq = 0
    try:
        for rec in iter_warc_records(raw):
            yield {
                "src_file": src_file,
                "rec_seq": seq,
                "warc_type": rec.warc_type,
                "record_id": rec.record_id,
                "target_uri": rec.target_uri,
                "warc_date": rec.warc_date,
                "content_type": rec.content_type,
                "content_length": len(rec.block),
                "block": rec.block,
                "error": None,
            }
            seq += 1
    except WarcFormatError as exc:
        yield {
            "src_file": src_file, "rec_seq": seq, "warc_type": None,
            "record_id": None, "target_uri": None, "warc_date": None,
            "content_type": None, "content_length": None, "block": None,
            "error": str(exc),
        }


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    parallelism: int | None = None,
) -> DataFrame:
    """All WARC archives under ``path`` → one row per record
    (``WARC_SCHEMA``).  ``binaryFile`` reads one archive per row —
    Common Crawl segments are ~1 GB, one per task; ``parallelism``
    repartitions the archive list when there are fewer files than
    cores (the id-repartition-before-Python rule)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for _, file_row in pdf.iterrows():
                for row in records_from_bytes(
                    file_row["path"], bytes(file_row["content"])
                ):
                    rows.append(row)
                    if len(rows) >= _YIELD_EVERY:
                        yield pd.DataFrame(rows)
                        rows = []
            if rows:
                yield pd.DataFrame(rows)

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    if parallelism:
        df = df.repartition(parallelism)
    return df.mapInPandas(gen, schema=WARC_SCHEMA)


def wet_text(records: DataFrame) -> DataFrame:
    """WET stage: ``conversion`` records → (src_file, target_uri,
    warc_date, text).  Pure JVM (filter + decode) — no Python."""
    return (
        records.where(F.col("warc_type") == "conversion")
        .select(
            "src_file", "target_uri", "warc_date",
            F.decode(F.col("block"), "UTF-8").alias("text"),
        )
    )


HTTP_SCHEMA = (
    "src_file string, target_uri string, warc_date string, "
    "status int, http_content_type string, body binary, error string"
)


def http_responses(records: DataFrame) -> DataFrame:
    """``response`` records → parsed HTTP entities (``HTTP_SCHEMA``).
    Parse failures land in ``error`` (side-output), the payload decoded
    per Transfer-/Content-Encoding."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                row = {
                    "src_file": r["src_file"],
                    "target_uri": r["target_uri"],
                    "warc_date": r["warc_date"],
                    "status": None, "http_content_type": None,
                    "body": None, "error": None,
                }
                try:
                    status, headers, body = parse_http_response(
                        bytes(r["block"]))
                    row.update(status=status, body=body,
                               http_content_type=headers.get(
                                   "content-type"))
                except WarcFormatError as exc:
                    row["error"] = str(exc)
                rows.append(row)
            yield pd.DataFrame(rows)

    cols = ["src_file", "target_uri", "warc_date", "block"]
    return (
        records.where(F.col("warc_type") == "response")
        .select(*cols)
        .mapInPandas(gen, schema=HTTP_SCHEMA)
    )


__all__ = [
    "HTTP_SCHEMA",
    "WARC_SCHEMA",
    "WarcFormatError",
    "WarcRecord",
    "encode_warc",
    "http_responses",
    "iter_warc_records",
    "parse_http_response",
    "read_warc",
    "records_from_bytes",
    "wet_text",
]
