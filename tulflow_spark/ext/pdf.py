"""Dependency-free PDF text extraction (r9 VERDICT #3).

After HTML, PDF is the most common training-data document format; the
container has no pdfminer/pypdf, so this is the repo's proven
protocol-re-implementation move (`ext/onnx_mini.py`, `ext/delta_log.py`)
applied to ISO 32000: a tolerant indirect-object scan (xref-independent,
so mild xref corruption doesn't lose text), stdlib-zlib FlateDecode,
object-stream (ObjStm) expansion for 1.5+ files, a page-tree walk, and
a content-stream interpreter covering the text operators.

Extraction subset (documented, deterministic — the oracle pair relies
on it):

- ``Tj`` / ``'`` / ``"`` show strings; ``TJ`` concatenates its strings
  and ignores kerning numbers.
- ``Td``/``TD`` with a vertical component, ``T*``, ``'``, ``"`` start a
  new line; ``Tm`` starts a new line when it moves the vertical
  position.  Pages join with ``\\f``.
- String bytes decode as cp1252 (WinAnsi, the common simple-font
  encoding) with latin-1 fallback; octal/hex escapes per the spec.

Typed walls (:class:`PdfError`): encrypted files (``/Encrypt``),
non-Flate stream filters, PNG-predicted content streams, and composite
(``/Type0``) or CMap-subsetted fonts, whose bytes are code points into
an embedded CMap — decoding them as WinAnsi would be silently wrong.

``encode_pdf`` is the production fixture encoder (the mm*/warc
strategy): a classic xref-table PDF 1.4 writer with Flate-compressed
content streams, used by tests and the driver-gated pair; tests also
hand-write PDFs byte-by-byte so the encoder and decoder cannot share a
bug.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

__all__ = ["PdfError", "PdfName", "PdfRef", "PdfDocument", "encode_pdf",
           "pdf_text"]


class PdfError(ValueError):
    """Typed malformed/unsupported-PDF error."""


class PdfName(str):
    """A /Name token (distinct from a string literal)."""

    __slots__ = ()


@dataclass(frozen=True)
class PdfRef:
    """An indirect reference ``num gen R``."""

    num: int
    gen: int


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Positioned reader over the raw bytes of one object body."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos
        self._depth = 0  # container nesting; bounded so a crafted
        # '[[[[...' raises PdfError, not RecursionError (which would
        # escape the typed-error contract and kill the whole batch)

    def _skip_ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            c = buf[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                nl = buf.find(b"\n", self.pos)
                self.pos = n if nl < 0 else nl + 1
            else:
                return

    def peek(self) -> int:
        self._skip_ws()
        if self.pos >= len(self.buf):
            raise PdfError("unexpected EOF in object")
        return self.buf[self.pos]

    def parse(self):
        """One PDF object → Python value (dict keys are str)."""
        c = self.peek()
        buf = self.buf
        if c == 0x2F:  # /Name
            return self._name()
        if c == 0x28:  # (string)
            return self._literal_string()
        if c == 0x3C:  # << dict or <hex string>
            if buf[self.pos:self.pos + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if c == 0x5B:  # [ array
            return self._array()
        if c in b"+-.0123456789":
            return self._number_or_ref()
        word = self._bareword()
        if word == b"true":
            return True
        if word == b"false":
            return False
        if word == b"null":
            return None
        raise PdfError(f"unexpected token {word[:20]!r}")

    def _bareword(self) -> bytes:
        self._skip_ws()
        start = self.pos
        buf, n = self.buf, len(self.buf)
        while self.pos < n and buf[self.pos] not in _WS \
                and buf[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            raise PdfError(
                f"bad token at byte {start}: {buf[start:start + 8]!r}")
        return buf[start:self.pos]

    def _name(self) -> PdfName:
        self._skip_ws()
        self.pos += 1  # '/'
        start = self.pos
        buf, n = self.buf, len(self.buf)
        out = bytearray()
        while self.pos < n and buf[self.pos] not in _WS \
                and buf[self.pos] not in _DELIM:
            c = buf[self.pos]
            if c == 0x23 and self.pos + 2 < n:  # #xx hex escape
                try:
                    out.append(int(buf[self.pos + 1:self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        if self.pos == start and not out:
            return PdfName("")  # the empty name is legal
        return PdfName(out.decode("latin-1"))

    def _number_or_ref(self):
        tok = self._bareword()
        try:
            if b"." in tok:
                return float(tok)
            num = int(tok)
        except ValueError:
            raise PdfError(f"bad number {tok[:20]!r}") from None
        # lookahead for "gen R"
        save = self.pos
        self._skip_ws()
        m = re.match(rb"(\d+)\s+R(?![A-Za-z0-9])",
                     self.buf[self.pos:self.pos + 24])
        if num >= 0 and m:
            self.pos += m.end()
            return PdfRef(num, int(m.group(1)))
        self.pos = save
        return num

    def _literal_string(self) -> bytes:
        buf, n = self.buf, len(self.buf)
        self.pos += 1  # '('
        depth = 1
        out = bytearray()
        while self.pos < n:
            c = buf[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= n:
                    break
                e = buf[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"01234567":  # 1-3 octal digits
                    digits = bytearray([e])
                    self.pos += 1
                    while len(digits) < 3 and self.pos < n \
                            and buf[self.pos] in b"01234567":
                        digits.append(buf[self.pos])
                        self.pos += 1
                    out.append(int(digits, 8) & 0xFF)
                elif e == 0x0A:  # line continuation
                    self.pos += 1
                elif e == 0x0D:
                    self.pos += 1
                    if self.pos < n and buf[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("unterminated string literal")

    def _hex_string(self) -> bytes:
        end = self.buf.find(b">", self.pos)
        if end < 0:
            raise PdfError("unterminated hex string")
        digits = re.sub(rb"[^0-9A-Fa-f]", b"", self.buf[self.pos + 1:end])
        self.pos = end + 1
        if len(digits) % 2:
            digits += b"0"
        return bytes.fromhex(digits.decode("ascii"))

    def _enter(self) -> None:
        self._depth += 1
        if self._depth > 64:
            raise PdfError("object nesting too deep")

    def _array(self) -> list:
        self.pos += 1  # '['
        self._enter()
        out = []
        while True:
            if self.peek() == 0x5D:
                self.pos += 1
                self._depth -= 1
                return out
            out.append(self.parse())

    def _dict(self) -> dict:
        self.pos += 2  # '<<'
        self._enter()
        out: dict = {}
        while True:
            c = self.peek()
            if self.buf[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                self._depth -= 1
                return out
            if c != 0x2F:
                raise PdfError(
                    f"dict key must be a name, got byte {c:#x}")
            key = self._name()
            out[str(key)] = self.parse()


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream(\r\n|\n|\r)")


class PdfDocument:
    """Parsed file: indirect objects (ObjStm expanded), page tree,
    text extraction."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("not a PDF (missing %PDF- header)")
        self.data = data
        # objects: num -> (gen, python value, stream bytes or None)
        self.objects: dict[int, tuple[int, object, bytes | None]] = {}
        self._scan_objects()
        self._check_encrypted()
        self._expand_object_streams()

    # -- parsing ------------------------------------------------------

    def _scan_objects(self) -> None:
        data = self.data
        consumed = 0  # end of the last parsed object body/stream:
        # binary stream bytes can contain 'N M obj' — a match starting
        # inside an already-consumed extent is stream DATA, and parsing
        # it would shadow the real object N or abort on a phantom
        # unterminated stream
        for m in _OBJ_RE.finditer(data):
            if m.start() < consumed:
                continue
            num, gen = int(m.group(1)), int(m.group(2))
            lex = _Lexer(data, m.end())
            try:
                value = lex.parse()
            except PdfError:
                continue  # tolerate one junk object; scan goes on
            stream = None
            end_pos = lex.pos
            if isinstance(value, dict):
                sm = _STREAM_RE.match(data, self._skip_ws_at(lex.pos))
                if sm:
                    start = sm.end()
                    length = value.get("Length")
                    if isinstance(length, int) and 0 <= length \
                            and data[start + length:].lstrip(
                                bytes(_WS)).startswith(b"endstream"):
                        stream = data[start:start + length]
                        end_pos = start + length
                    else:
                        # indirect/broken /Length: scan to endstream
                        end = data.find(b"endstream", start)
                        if end < 0:
                            raise PdfError(
                                f"object {num}: unterminated stream")
                        stream = data[start:end].rstrip(b"\r\n")
                        end_pos = end
            consumed = end_pos
            have = self.objects.get(num)
            if have is None or gen >= have[0]:
                self.objects[num] = (gen, value, stream)

    def _skip_ws_at(self, pos: int) -> int:
        data = self.data
        while pos < len(data) and data[pos] in _WS:
            pos += 1
        return pos

    def _check_encrypted(self) -> None:
        # /Encrypt lives in the trailer dict (classic) or the xref
        # stream dict (1.5+); both are raw (uncompressed) bytes, so a
        # raw scan is a sound over-approximation — false positives wall
        # typed, never decode garbage
        for m in re.finditer(rb"trailer", self.data):
            lex = _Lexer(self.data, m.end())
            try:
                tdict = lex.parse()
            except PdfError:
                continue
            if isinstance(tdict, dict) and "Encrypt" in tdict:
                raise PdfError("encrypted PDF (no decryption support)")
        for _num, (_gen, value, _s) in self.objects.items():
            if isinstance(value, dict) and "Encrypt" in value \
                    and value.get("Type") == "XRef":
                raise PdfError("encrypted PDF (no decryption support)")

    def _expand_object_streams(self) -> None:
        """PDF 1.5 /Type /ObjStm: compressed objects live inside a
        stream as ``N`` (num, offset) header pairs + bodies."""
        for num in list(self.objects):
            gen, value, stream = self.objects[num]
            if not (isinstance(value, dict)
                    and value.get("Type") == "ObjStm"):
                continue
            if stream is None:
                raise PdfError(f"ObjStm {num} has no stream")
            body = self._decode_stream(value, stream, what=f"ObjStm {num}")
            n = self.resolve(value.get("N"))
            first = self.resolve(value.get("First"))
            if not isinstance(n, int) or not isinstance(first, int):
                raise PdfError(f"ObjStm {num}: bad /N or /First")
            head = _Lexer(body[:first])
            pairs = []
            try:
                for _ in range(n):
                    onum = head.parse()
                    ooff = head.parse()
                    pairs.append((onum, ooff))
            except PdfError as exc:
                raise PdfError(f"ObjStm {num}: bad header: {exc}") from None
            for onum, ooff in pairs:
                if not isinstance(onum, int) or not isinstance(ooff, int):
                    raise PdfError(f"ObjStm {num}: non-integer header")
                lex = _Lexer(body, first + ooff)
                oval = lex.parse()
                if onum not in self.objects:  # top-level wins
                    self.objects[onum] = (0, oval, None)

    def _decode_stream(self, sdict: dict, raw: bytes, what: str) -> bytes:
        filters = self.resolve(sdict.get("Filter"))
        if filters is None:
            return raw
        if not isinstance(filters, list):
            filters = [filters]
        parms = self.resolve(sdict.get("DecodeParms"))
        if parms is not None and not isinstance(parms, list):
            parms = [parms]
        out = raw
        for i, f in enumerate(filters):
            f = self.resolve(f)
            if str(f) != "FlateDecode":
                raise PdfError(
                    f"{what}: unsupported stream filter /{f}")
            p = self.resolve(parms[i]) if parms and i < len(parms) else None
            if isinstance(p, dict) and self.resolve(
                    p.get("Predictor", 1)) not in (None, 1):
                raise PdfError(f"{what}: PNG/TIFF predictor unsupported")
            try:
                out = zlib.decompress(out)
            except zlib.error as exc:
                raise PdfError(f"{what}: bad Flate data: {exc}") from None
        return out

    # -- object graph -------------------------------------------------

    def resolve(self, obj, _depth: int = 0):
        while isinstance(obj, PdfRef):
            if _depth > 64:
                raise PdfError("reference loop")
            got = self.objects.get(obj.num)
            if got is None:
                return None
            obj = got[1]
            _depth += 1
        return obj

    def _stream_of(self, ref) -> tuple[dict, bytes]:
        if not isinstance(ref, PdfRef):
            raise PdfError("stream operand must be an indirect ref")
        got = self.objects.get(ref.num)
        if got is None or got[2] is None:
            raise PdfError(f"object {ref.num} is not a stream")
        sdict = got[1]
        if not isinstance(sdict, dict):
            raise PdfError(f"object {ref.num}: stream without dict")
        # late-resolve an indirect /Length (the scan already bounded the
        # bytes by `endstream`; nothing further needed here)
        return sdict, got[2]

    def catalog(self) -> dict:
        for _num, (_gen, value, _s) in self.objects.items():
            v = value
            if isinstance(v, dict) and v.get("Type") == "Catalog":
                return v
        raise PdfError("no /Catalog object")

    def pages(self) -> list[dict]:
        root = self.resolve(self.catalog().get("Pages"))
        if not isinstance(root, dict):
            raise PdfError("catalog has no /Pages tree")
        out: list[dict] = []

        def walk(node: dict, depth: int, res) -> None:
            if depth > 64:
                raise PdfError("page tree too deep (loop?)")
            # /Resources is inheritable (ISO 32000 §7.7.3.4): a page
            # without its own entry uses the nearest ancestor's — the
            # composite-font wall must see the EFFECTIVE resources
            if node.get("Resources") is not None:
                res = node.get("Resources")
            t = node.get("Type")
            if t == "Page":
                if "Resources" not in node and res is not None:
                    node = dict(node, Resources=res)
                out.append(node)
                return
            kids = self.resolve(node.get("Kids"))
            if not isinstance(kids, list):
                raise PdfError("/Pages node without /Kids")
            for k in kids:
                kid = self.resolve(k)
                if not isinstance(kid, dict):
                    raise PdfError("bad /Kids entry")
                walk(kid, depth + 1, res)

        walk(root, 0, None)
        return out

    # -- text extraction ----------------------------------------------

    def _check_fonts(self, page: dict) -> None:
        res = self.resolve(page.get("Resources"))
        fonts = self.resolve(res.get("Font")) if isinstance(res, dict) \
            else None
        if not isinstance(fonts, dict):
            return
        for fname, fref in fonts.items():
            f = self.resolve(fref)
            if not isinstance(f, dict):
                continue
            if f.get("Subtype") == "Type0" or "ToUnicode" in f:
                raise PdfError(
                    f"font /{fname} is composite/CMap-mapped: bytes "
                    "are CMap code points, not WinAnsi — refusing to "
                    "extract silently-wrong text")

    def _page_content(self, page: dict) -> bytes:
        contents = page.get("Contents")
        if contents is None:
            return b""
        # /Contents: a ref to a stream, a ref to an array of refs, or a
        # direct array of refs
        if isinstance(contents, PdfRef):
            got = self.objects.get(contents.num)
            if got is not None and got[2] is None \
                    and isinstance(got[1], list):
                items = got[1]
            else:
                items = [contents]
        elif isinstance(contents, list):
            items = contents
        else:
            raise PdfError("bad /Contents entry")
        parts = []
        for item in items:
            sdict, raw = self._stream_of(item)
            parts.append(self._decode_stream(sdict, raw, "content stream"))
        return b"\n".join(parts)

    def page_text(self, page: dict) -> str:
        self._check_fonts(page)
        content = self._page_content(page)
        return _interpret_text(content)

    def text(self) -> str:
        """All pages' text, pages joined by form-feed."""
        return "\f".join(self.page_text(p) for p in self.pages())


def _decode_pdf_bytes(b: bytes) -> str:
    try:
        return b.decode("cp1252")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _interpret_text(content: bytes) -> str:
    """Walk one content stream's text operators → extracted text (see
    module docstring for the exact subset)."""
    lex = _Lexer(content)
    stack: list = []
    lines: list[str] = []
    cur: list[str] = []
    ty_last: float | None = None

    def newline() -> None:
        nonlocal cur
        if cur:
            lines.append("".join(cur))
            cur = []

    while True:
        try:
            c = lex.peek()
        except PdfError:
            break  # EOF
        if c in b"/([<+-.0123456789" and not (
                c == 0x3C and lex.buf[lex.pos:lex.pos + 2] == b"<<"):
            stack.append(lex.parse())
            continue
        if c == 0x3C:  # inline dict operand (e.g. BDC property list)
            stack.append(lex.parse())
            continue
        op = lex._bareword().decode("latin-1")
        if op == "Tj" and stack and isinstance(stack[-1], bytes):
            cur.append(_decode_pdf_bytes(stack[-1]))
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    cur.append(_decode_pdf_bytes(el))
        elif op in ("'", '"'):
            newline()
            if stack and isinstance(stack[-1], bytes):
                cur.append(_decode_pdf_bytes(stack[-1]))
        elif op in ("Td", "TD"):
            if len(stack) >= 2 and isinstance(stack[-1], (int, float)) \
                    and stack[-1] != 0:
                newline()
        elif op == "T*":
            newline()
        elif op == "Tm":
            if len(stack) >= 6 and isinstance(stack[-1], (int, float)):
                ty = float(stack[-1])
                # break when the vertical position moves — including
                # away from an un-tracked position with text pending
                if ty != ty_last and (ty_last is not None or cur):
                    newline()
                ty_last = ty
        elif op == "BT":
            ty_last = None
        elif op == "BI":
            # inline image: skip to EI (binary payload would desync the
            # lexer)
            end = content.find(b"EI", lex.pos)
            if end < 0:
                break
            lex.pos = end + 2
        stack = []
    newline()
    return "\n".join(lines)


def pdf_text(data: bytes) -> str:
    """Convenience: bytes → extracted text (typed :class:`PdfError` on
    unsupported/encrypted/malformed input)."""
    return PdfDocument(data).text()


# -- fixture encoder --------------------------------------------------


def _esc_literal(s: str) -> bytes:
    out = s.encode("cp1252", "replace")
    return out.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
              .replace(b")", rb"\)")


def encode_pdf(
    pages: list[list[str]],
    compress: bool = True,
    use_tj_arrays: bool = False,
) -> bytes:
    """Production fixture encoder: page line-lists → a classic PDF 1.4
    file (xref table, Helvetica Type1 font, one Flate-compressed
    content stream per page).  ``use_tj_arrays`` emits every other line
    as a kerned ``TJ`` array (split mid-line) so the TJ path is proven
    by roundtrips too.  Deterministic byte output (no ids, no dates)."""
    objects: list[bytes] = []  # bodies, object number = index + 1

    n_pages = len(pages)
    font_num = 3 + n_pages * 2
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {page_num + 1} 0 R >>".encode())
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append(b"0 -14 Td")
            if use_tj_arrays and j % 2 == 1 and len(line) > 2:
                mid = len(line) // 2
                ops.append(b"[(" + _esc_literal(line[:mid]) + b") -250 ("
                           + _esc_literal(line[mid:]) + b")] TJ")
            else:
                ops.append(b"(" + _esc_literal(line) + b") Tj")
        ops.append(b"ET")
        body = b"\n".join(ops)
        if compress:
            flate = zlib.compress(body, 9)
            objects.append(
                f"<< /Length {len(flate)} /Filter /FlateDecode >>"
                .encode() + b"\nstream\n" + flate + b"\nendstream")
        else:
            objects.append(
                f"<< /Length {len(body)} >>".encode()
                + b"\nstream\n" + body + b"\nendstream")
    objects.append(b"<< /Type /Font /Subtype /Type1 "
                   b"/BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")

    out = bytearray(b"%PDF-1.4\n%\xc2\xa5\xc2\xb1\n")
    offsets = [0]
    for i, body in enumerate(objects):
        offsets.append(len(out))
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
