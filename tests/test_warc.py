"""sources/warc.py: WARC/WET container ingestion.

Golden strategy (the repo's codec rule): an INDEPENDENT byte-level
writer here in tests builds archives the production encoder never
touched, the production walker must parse them exactly; encode_warc
roundtrips prove the fixture path; byte-flip fuzz proves every
malformed archive dies typed (or parses clean), never with an untyped
exception."""

from __future__ import annotations

import gzip

import pytest

from tulflow_spark.sources.warc import (
    WarcFormatError,
    encode_warc,
    http_responses,
    iter_warc_records,
    parse_http_response,
    read_warc,
    wet_text,
)


def _hand_record(warc_type=b"resource", block=b"hello world",
                 extra=b"") -> bytes:
    """Independent writer: no shared code with encode_warc."""
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n"
        b"WARC-Date: 2024-03-01T12:00:00Z\r\n"
        b"WARC-Target-URI: https://example.com/a\r\n"
        + extra +
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(block)).encode() + b"\r\n"
        b"\r\n" + block + b"\r\n\r\n"
    )


def test_hand_written_record_parses_exactly():
    recs = list(iter_warc_records(_hand_record()))
    assert len(recs) == 1
    r = recs[0]
    assert r.version == "WARC/1.0"
    assert r.warc_type == "resource"
    assert r.target_uri == "https://example.com/a"
    assert r.warc_date == "2024-03-01T12:00:00Z"
    assert r.content_type == "text/plain"
    assert r.block == b"hello world"


def test_multi_record_and_gzip_members():
    plain = _hand_record() + _hand_record(block=b"second block")
    # one gzip member per record — the Common Crawl layout
    members = gzip.compress(_hand_record(), mtime=0) + gzip.compress(
        _hand_record(block=b"second block"), mtime=0)
    for raw in (plain, members):
        recs = list(iter_warc_records(raw))
        assert [r.block for r in recs] == [b"hello world", b"second block"]


def test_block_containing_crlf_crlf_framed_by_length():
    """Content-Length framing, not separators: a block embedding the
    record separator must parse whole."""
    tricky = b"a\r\n\r\nWARC/1.0\r\nb"
    raw = _hand_record(block=tricky) + _hand_record(block=b"after")
    recs = list(iter_warc_records(raw))
    assert [r.block for r in recs] == [tricky, b"after"]


def test_folded_header_continuation():
    raw = _hand_record(extra=b"WARC-Concurrent-To: <urn:a>\r\n"
                             b"  <urn:b>\r\n")
    (r,) = iter_warc_records(raw)
    assert r.headers["warc-concurrent-to"] == "<urn:a> <urn:b>"


def test_trailing_garbage_tolerance_and_record0_typed():
    good = _hand_record()
    # after >= 1 good record: junk trailer = clean stop
    assert len(list(iter_warc_records(good + b"\x00\x01garbage"))) == 1
    # on record 0: typed
    with pytest.raises(WarcFormatError, match="version line"):
        list(iter_warc_records(b"\x00\x01garbage"))
    with pytest.raises(WarcFormatError, match="version line"):
        list(iter_warc_records(good + b"\x00junk", tolerant=False))


def test_missing_and_truncated_walls():
    no_len = (b"WARC/1.0\r\nWARC-Type: resource\r\n\r\nbody\r\n\r\n")
    with pytest.raises(WarcFormatError, match="Content-Length"):
        list(iter_warc_records(no_len))
    truncated = _hand_record()[:-10]
    with pytest.raises(WarcFormatError, match="truncated"):
        list(iter_warc_records(truncated))
    # cut into the DEFLATE data so record 0 itself dies typed; a cut
    # that only loses the gzip trailer after a complete record is the
    # tolerant clean-stop case, not an error
    gz = gzip.compress(_hand_record())
    with pytest.raises(WarcFormatError):
        list(iter_warc_records(gz[:40]))


def test_encode_warc_roundtrip_both_layouts():
    records = [
        {"warc_type": "warcinfo", "block": b"software: t\r\n",
         "content_type": "application/warc-fields"},
        {"warc_type": "response", "uri": "https://x.test/p",
         "date": "2024-05-05T00:00:00Z", "block": b"HTTP/1.1 200 OK",
         "content_type": "application/http; msgtype=response"},
        {"warc_type": "conversion", "uri": "https://x.test/p",
         "block": "héllo wörld".encode(), "content_type": "text/plain"},
    ]
    for gz in (True, False):
        out = list(iter_warc_records(encode_warc(records, gz)))
        assert [r.warc_type for r in out] == [
            "warcinfo", "response", "conversion"]
        assert out[2].block.decode() == "héllo wörld"
        assert out[1].target_uri == "https://x.test/p"
        assert out[1].warc_date == "2024-05-05T00:00:00Z"
        # deterministic content-derived record ids (fixture stability)
        again = list(iter_warc_records(encode_warc(records, gz)))
        assert [r.record_id for r in again] == [r.record_id for r in out]


def _http(body: bytes, headers: bytes = b"") -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" + headers
            + b"\r\n" + body)


def test_parse_http_response_plain_chunked_gzip_deflate():
    import zlib

    payload = b"<html>hi</html>"
    status, headers, body = parse_http_response(_http(payload))
    assert (status, body) == (200, payload)
    assert headers["content-type"] == "text/html"
    chunked = _http(b"5\r\n<html\r\na\r\n>hi</html>\r\n0\r\n\r\n",
                    b"Transfer-Encoding: chunked\r\n")
    assert parse_http_response(chunked)[2] == payload
    gz = _http(gzip.compress(payload),
               b"Content-Encoding: gzip\r\n")
    assert parse_http_response(gz)[2] == payload
    raw_co = zlib.compressobj(wbits=-15)
    raw_deflate = raw_co.compress(payload) + raw_co.flush()
    for blob in (zlib.compress(payload), raw_deflate):
        df = _http(blob, b"Content-Encoding: deflate\r\n")
        assert parse_http_response(df)[2] == payload
    # raw wire form when decode_content=False
    assert parse_http_response(gz, decode_content=False)[2] == \
        gzip.compress(payload)


def test_parse_http_response_lf_separator_and_walls():
    status, _, body = parse_http_response(b"HTTP/1.0 301 Moved\nX: y\n\nB")
    assert (status, body) == (301, b"B")
    with pytest.raises(WarcFormatError, match="not an HTTP response"):
        parse_http_response(b"FTP/1.0 200\r\n\r\nx")
    with pytest.raises(WarcFormatError, match="separator"):
        parse_http_response(b"HTTP/1.1 200 OK\r\nno-sep")
    with pytest.raises(WarcFormatError, match="chunked"):
        parse_http_response(_http(b"zz\r\nbody\r\n0\r\n\r\n",
                                  b"Transfer-Encoding: chunked\r\n"))
    with pytest.raises(WarcFormatError, match="gzip"):
        parse_http_response(_http(b"\x1f\x8bnot-gzip",
                                  b"Content-Encoding: gzip\r\n"))


def test_byte_flip_fuzz_typed_or_clean():
    """Every single-byte corruption dies WarcFormatError or parses —
    never an untyped exception (the repo's decoder fuzz rule)."""
    base = _hand_record() + _hand_record(block=b"x" * 3)
    for pos in range(len(base)):
        for flip in (0x00, 0xFF, base[pos] ^ 0x20):
            mutated = base[:pos] + bytes([flip]) + base[pos + 1:]
            try:
                list(iter_warc_records(mutated, tolerant=False))
            except WarcFormatError:
                pass
    gz = gzip.compress(base, mtime=0)
    for pos in range(len(gz)):
        mutated = gz[:pos] + bytes([gz[pos] ^ 0xFF]) + gz[pos + 1:]
        try:
            list(iter_warc_records(mutated, tolerant=False))
        except WarcFormatError:
            pass


def test_read_warc_dataframe_path(spark, tmp_path):
    """binaryFile → records frame, error side-output, WET + HTTP
    stages — the full Spark surface over on-disk archives."""
    a = tmp_path / "seg-00000.warc.gz"
    payload = b"<html><body><p>doc one</p></body></html>"
    a.write_bytes(encode_warc([
        {"warc_type": "warcinfo", "block": b"software: test\r\n"},
        {"warc_type": "response", "uri": "https://a.test/1",
         "block": _http(payload),
         "content_type": "application/http; msgtype=response"},
        {"warc_type": "conversion", "uri": "https://a.test/1",
         "block": b"doc one", "content_type": "text/plain"},
    ]))
    b = tmp_path / "seg-00001.warc.gz"
    b.write_bytes(encode_warc([
        {"warc_type": "response", "uri": "https://b.test/2",
         "block": b"NOT HTTP AT ALL",
         "content_type": "application/http; msgtype=response"},
    ]))
    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8bcorrupt")

    recs = read_warc(spark, str(tmp_path), parallelism=4).cache()
    by_file = {r["src_file"].rsplit("/", 1)[-1]: r
               for r in recs.where("error is not null").collect()}
    assert set(by_file) == {"bad.warc.gz"}  # archive-level side-output
    ok = recs.where("error is null")
    assert ok.count() == 4
    wet = {r["target_uri"]: r["text"] for r in wet_text(recs).collect()}
    assert wet == {"https://a.test/1": "doc one"}
    http = {r["target_uri"]: r for r in http_responses(recs).collect()}
    assert http["https://a.test/1"]["status"] == 200
    assert bytes(http["https://a.test/1"]["body"]) == payload
    assert http["https://a.test/1"]["error"] is None
    assert http["https://b.test/2"]["status"] is None
    assert "separator" in http["https://b.test/2"]["error"]
