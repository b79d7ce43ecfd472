"""ext/pdf.py: dependency-free PDF text extraction.

Golden strategy: a HAND-WRITTEN byte-level PDF here in tests (never
touched by encode_pdf) must extract exactly; encode_pdf roundtrips
prove the fixture path; every typed wall (encryption, non-Flate
filters, predictors, composite fonts) and the byte-flip fuzz rule are
pinned."""

from __future__ import annotations

import zlib

import pytest

from tulflow_spark.ext.pdf import (
    PdfDocument,
    PdfError,
    encode_pdf,
    pdf_text,
)


def _minimal_pdf(content: bytes, extra_objects: bytes = b"",
                 font: bytes = b"<< /Type /Font /Subtype /Type1 "
                               b"/BaseFont /Helvetica >>",
                 trailer_extra: bytes = b"",
                 length_override: bytes | None = None) -> bytes:
    """Independent writer: builds the file by string pasting, no shared
    code with encode_pdf.  Offsets in the xref are deliberately fake
    (the parser is scan-based and must not care)."""
    length = (length_override if length_override is not None
              else str(len(content)).encode())
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> "
        b"/Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + length + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj " + font + b" endobj\n"
        + extra_objects +
        b"xref\n0 6\ntrailer\n<< /Size 6 /Root 1 0 R "
        + trailer_extra + b">>\nstartxref\n9\n%%EOF\n"
    )


def test_hand_written_pdf_extracts_exactly():
    content = (b"BT /F1 12 Tf 72 720 Td (Hello) Tj (, world) Tj "
               b"0 -14 Td [(ker) -200 (ned)] TJ "
               b"T* (after T-star) Tj "
               b"(quoted line) ' ET")
    assert pdf_text(_minimal_pdf(content)) == \
        "Hello, world\nkerned\nafter T-star\nquoted line"


def test_string_escapes_hex_and_octal():
    content = (br"BT (a\(b\)c \\ \164ab) Tj "
               b"<48692100> Tj ET")
    # \164 octal = 't'; hex 48 69 21 00 = 'Hi!\x00' (cp1252-safe NUL
    # stays a control char); consecutive Tj shows concatenate
    assert pdf_text(_minimal_pdf(content)) == "a(b)c \\ tabHi!\x00"


def test_nested_parens_and_newline_ops():
    content = (b"BT (outer (inner) tail) Tj "
               b"1 0 0 1 72 700 Tm (tm line) Tj "
               b"1 0 0 1 200 700 Tm (same y: no break) Tj ET")
    assert pdf_text(_minimal_pdf(content)) == \
        "outer (inner) tail\ntm linesame y: no break"


def test_td_zero_vertical_does_not_break_line():
    content = b"BT (a) Tj 10 0 Td (b) Tj 0 -5 TD (c) Tj ET"
    assert pdf_text(_minimal_pdf(content)) == "ab\nc"


def test_indirect_length_and_flate_content():
    body = b"BT (compressed) Tj ET"
    flate = zlib.compress(body)
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 6 0 R /Filter /FlateDecode >>\n"
        b"stream\n" + flate + b"\nendstream endobj\n"
        b"6 0 obj " + str(len(flate)).encode() + b" endobj\n"
        b"trailer << /Size 7 /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_text(raw) == "compressed"


def test_contents_array_of_streams():
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R "
        b"/Contents [4 0 R 6 0 R] >> endobj\n"
        b"4 0 obj << /Length 14 >>\nstream\nBT (one) Tj ET\nendstream "
        b"endobj\n"
        b"6 0 obj << /Length 16 >>\nstream\nT* (two) Tj ET\nendstream "
        b"endobj\n"
        b"trailer << /Size 7 /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_text(raw) == "one\ntwo"


def test_object_stream_expansion():
    """PDF 1.5 layout: the page tree lives inside a /Type /ObjStm."""
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    payload = bytearray()
    header = bytearray()
    for num, b in objs:
        header += f"{num} {len(payload)} ".encode()
        payload += b + b" "
    first = len(header)
    stm = zlib.compress(bytes(header) + bytes(payload))
    raw = (
        b"%PDF-1.5\n"
        b"5 0 obj << /Type /ObjStm /N 3 /First " + str(first).encode()
        + b" /Length " + str(len(stm)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + stm
        + b"\nendstream endobj\n"
        b"4 0 obj << /Length 15 >>\nstream\nBT (objstm) Tj ET\nendstream"
        b" endobj\n"
        b"trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_text(raw) == "objstm"


def test_encode_pdf_roundtrips():
    pages = [["First page line one", "line two (escaped) \\ done"],
             ["Second page"]]
    for compress in (True, False):
        for tj in (True, False):
            blob = encode_pdf(pages, compress=compress,
                              use_tj_arrays=tj)
            assert pdf_text(blob) == (
                "First page line one\nline two (escaped) \\ done"
                "\fSecond page")
    doc = PdfDocument(encode_pdf(pages))
    assert len(doc.pages()) == 2


def test_cp1252_bytes_decode():
    # 0x93/0x94 are cp1252 curly quotes; latin-1 would give C1 controls
    content = b"BT (\x93quoted\x94 caf\xe9) Tj ET"
    assert pdf_text(_minimal_pdf(content)) == "“quoted” caf\xe9"


def test_typed_walls():
    with pytest.raises(PdfError, match="missing %PDF"):
        pdf_text(b"not a pdf")
    with pytest.raises(PdfError, match="encrypted"):
        pdf_text(_minimal_pdf(b"BT (x) Tj ET",
                              trailer_extra=b"/Encrypt 9 0 R "))
    bad_filter = _minimal_pdf(b"")
    bad_filter = bad_filter.replace(
        b"<< /Length 0 >>",
        b"<< /Length 0 /Filter /DCTDecode >>")
    with pytest.raises(PdfError, match="unsupported stream filter"):
        pdf_text(bad_filter)
    flate = zlib.compress(b"BT (x) Tj ET")
    pred = _minimal_pdf(flate, length_override=str(len(flate)).encode())
    pred = pred.replace(
        b" >>\nstream",
        b" /Filter /FlateDecode /DecodeParms << /Predictor 12 >> "
        b">>\nstream", 1)
    with pytest.raises(PdfError, match="predictor"):
        pdf_text(pred)
    with pytest.raises(PdfError, match="composite"):
        pdf_text(_minimal_pdf(
            b"BT (x) Tj ET",
            font=b"<< /Type /Font /Subtype /Type0 /BaseFont /X >>"))
    with pytest.raises(PdfError, match="composite"):
        pdf_text(_minimal_pdf(
            b"BT (x) Tj ET",
            font=b"<< /Type /Font /Subtype /Type1 /BaseFont /X "
                 b"/ToUnicode 9 0 R >>"))
    with pytest.raises(PdfError, match="no /Catalog"):
        pdf_text(b"%PDF-1.4\ntrailer << /Size 1 >>")


def test_inline_image_skipped():
    content = (b"BT (before) Tj ET "
               b"BI /W 2 /H 2 /CS /G ID \x00\xff(\\danger Tj\x00 EI "
               b"BT (after) Tj ET")
    assert pdf_text(_minimal_pdf(content)) == "beforeafter"


def test_byte_flip_fuzz_typed_or_clean():
    base = encode_pdf([["fuzz target line", "two"]])
    for pos in range(0, len(base), 3):
        for flip in (0x00, 0xFF):
            mutated = base[:pos] + bytes([flip]) + base[pos + 1:]
            try:
                pdf_text(mutated)
            except PdfError:
                pass


def test_mediaprobe_routes_pdf():
    from tulflow_spark.ext.mediaprobe import probe_media_bytes

    meta = probe_media_bytes(encode_pdf([["a"], ["b"], ["c"]]))
    assert meta["format"] == "pdf"
    assert meta["n_frames"] == 3
    assert meta["codec"] == "pdf"


def test_resources_inherited_from_pages_node():
    """ISO 32000 §7.7.3.4: /Resources on the /Pages tree node is
    inherited by kid pages — the composite-font wall must see it."""
    base = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> "
        b"endobj\n"
        b"4 0 obj << /Length 20 >>\nstream\n"
        b"BT (inherited) Tj ET\nendstream endobj\n"
        b"5 0 obj FONTDICT endobj\n"
        b"xref\n0 6\ntrailer\n<< /Size 6 /Root 1 0 R >>\n"
        b"startxref\n9\n%%EOF\n"
    )
    ok = base.replace(b"FONTDICT", b"<< /Type /Font /Subtype /Type1 "
                                   b"/BaseFont /Helvetica >>")
    assert pdf_text(ok) == "inherited"
    composite = base.replace(b"FONTDICT", b"<< /Type /Font /Subtype "
                                          b"/Type0 /BaseFont /Foo >>")
    with pytest.raises(PdfError, match="composite"):
        pdf_text(composite)


def test_obj_keyword_inside_stream_body_is_data():
    """Binary stream bytes matching 'N M obj' must not shadow the real
    object N (the scan skips matches inside consumed stream extents)."""
    content = b"BT (real page) Tj ET\n3 0 obj null\n2 0 obj null"
    assert pdf_text(_minimal_pdf(content)) == "real page"


def test_lexer_nesting_bounded_typed():
    """Deep container nesting raises PdfError, not RecursionError
    (which would escape the typed-error contract and kill the batch)."""
    from tulflow_spark.ext.pdf import _Lexer

    with pytest.raises(PdfError, match="nesting too deep"):
        _Lexer(b"[" * 5000).parse()
    with pytest.raises(PdfError, match="nesting too deep"):
        _Lexer(b"<< /A " * 5000).parse()
