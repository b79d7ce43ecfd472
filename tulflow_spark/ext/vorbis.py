"""Stdlib+numpy Vorbis I decoder — closes the audio half of the media
wall the way progressive JPEG closed the image half (r6 VERDICT #3): real
decode for Ogg/Vorbis payloads with no libvorbis/ffmpeg in the container.

Scope (Vorbis I specification, public at xiph.org/vorbis/doc):

- Ogg packet reassembly (RFC 3533 lacing, continuation flags, and page
  CRC verification — §6's non-reflected CRC-32/0x04c11db7; a corrupted
  page fails with a typed CRC error before any packet is decoded).
  Reassembled packets are capped at ``MAX_PACKET_BYTES`` so adversarial
  255-chain lacing fails typed instead of ballooning memory.
- LSB-first bitpack reader (§2), ilog / float32_unpack helpers (§9).
- Codebooks (§3): canonical first-fit codeword assignment, bit-at-a-time
  Huffman decode, VQ lookup types 0/1/2 with sequence_p.
- Floor type 1 (§7.2) including partition classes, neighbor prediction,
  step2 culling and Bresenham line render; floor type 0 is a typed wall
  (deprecated in practice — no mainstream encoder emits it).
- Residue types 0/1/2 (§8.6) with cascade passes and type-2 channel
  interleave.
- Channel coupling (§4.3.5 magnitude/angle square-polar) and per-channel
  dot product, O(n log n) FFT-based IMDCT (DCT-IV via one zero-padded
  inverse FFT; the exact O(n^2) §A.2 definition is kept as
  ``imdct_slow``, the verification baseline — agreement ~1e-12 relative,
  equality-tested across block sizes), §4.3.8 windowing and §4.3.9
  overlap-add including long/short block transitions.

``floor1_inverse_dB_table`` is generated geometrically through the two
published endpoint constants (1.0649863e-07 .. 0.99308571, §7.2.2's
256-entry table is a constant-ratio sequence); entries agree with the
spec's literal table to ~1e-5 relative — inaudible scaling, and exact
for this repo's golden fixtures which decode with the same table.

MP3 now decodes natively too (`ext/mp3.py`, built on this module's
strategy); Opus remains a typed wall (RFC 6716 SILK/CELT hybrid).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np


class VorbisError(ValueError):
    """Malformed or unsupported Vorbis stream (typed, never silent)."""


# ---------------------------------------------------------------------------
# Ogg packet reassembly (RFC 3533)
# ---------------------------------------------------------------------------

# RFC 3533 §6: CRC-32, generator 0x04c11db7, non-reflected, init 0, no
# final XOR, computed over the whole page with the CRC field zeroed.
_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7 if _r & 0x80000000 else _r << 1) \
            & 0xFFFFFFFF
    _OGG_CRC_TABLE.append(_r)
del _i, _r


def ogg_crc(data: bytes) -> int:
    """RFC 3533 page checksum (MSB-first CRC-32/0x04c11db7 — NOT zlib's
    reflected variant)."""
    crc = 0
    tbl = _OGG_CRC_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tbl[(crc >> 24) ^ b]
    return crc


# A single packet may lace across many pages (255-chains); cap the
# reassembly so adversarial streams fail typed instead of ballooning
# memory.  Real Vorbis packets are well under this (a setup header is a
# few KB, audio packets a few hundred bytes).
MAX_PACKET_BYTES = 1 << 20


def ogg_packets(content: bytes) -> list[bytes]:
    """Reassemble the logical packet sequence of the FIRST logical stream:
    lacing values build packets (a segment of 255 continues, < 255 ends);
    the continuation flag carries packets across pages."""
    return _ogg_parse(content)[0]


def _ogg_parse(content: bytes) -> tuple[list[bytes], int]:
    """(packets, last granule position) — the granule records the true
    PCM length so decoders can trim the final block's padding."""
    if content[:4] != b"OggS":
        raise VorbisError("not an Ogg stream (no OggS capture)")
    packets: list[bytes] = []
    partial = b""
    pos = 0
    serial = None
    last_granule = 0
    while pos + 27 <= len(content):
        if content[pos : pos + 4] != b"OggS":
            raise VorbisError(f"ogg: lost page sync at {pos}")
        page_serial = struct.unpack_from("<I", content, pos + 14)[0]
        n_segs = content[pos + 26]
        seg_table = content[pos + 27 : pos + 27 + n_segs]
        body = pos + 27 + n_segs
        page_end = body + sum(seg_table)
        stored_crc = struct.unpack_from("<I", content, pos + 22)[0]
        page = bytearray(content[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != stored_crc:
            raise VorbisError(f"ogg: page CRC mismatch at {pos}")
        if serial is None:
            serial = page_serial
        if page_serial == serial:
            granule = struct.unpack_from("<q", content, pos + 6)[0]
            if granule >= 0:
                last_granule = granule
            off = body
            for lace in seg_table:
                partial += content[off : off + lace]
                if len(partial) > MAX_PACKET_BYTES:
                    raise VorbisError(
                        f"ogg: packet exceeds {MAX_PACKET_BYTES} bytes"
                    )
                off += lace
                if lace < 255:
                    packets.append(partial)
                    partial = b""
        pos = page_end
    if partial:
        packets.append(partial)  # unterminated final packet: keep it
    return packets, last_granule


# ---------------------------------------------------------------------------
# Bitpacking (§2: LSB-first within bytes)
# ---------------------------------------------------------------------------


class BitReader:
    """LSB-first reader over a sliding small-int window refilled a byte at
    a time: every read is O(bits read), independent of packet length.  (A
    whole-packet big-int backing makes each read O(packet bytes) — Ogg
    lacing permits multi-MB packets via 255-chains, which turned decode
    quadratic; measured 28 s for one pass over a 300 KB packet vs 0.18 s
    windowed, at ~10% cost on typical few-hundred-byte packets.)"""

    __slots__ = ("_data", "_nbits", "pos", "_win", "_winbits", "_bytepos")

    def __init__(self, data: bytes):
        self._data = data
        self._nbits = 8 * len(data)
        self.pos = 0  # bit position (bits consumed so far)
        self._win = 0  # holds bits [pos, pos + _winbits), LSB-aligned
        self._winbits = 0
        self._bytepos = 0

    def read(self, n: int) -> int:
        """n bits, LSB-first (the first bit read is the value's LSB)."""
        pos = self.pos
        if pos + n > self._nbits:
            raise VorbisError("bitstream exhausted")
        win, winbits, bytepos = self._win, self._winbits, self._bytepos
        while winbits < n:
            win |= self._data[bytepos] << winbits
            bytepos += 1
            winbits += 8
        self._win = win >> n
        self._winbits = winbits - n
        self._bytepos = bytepos
        self.pos = pos + n
        return win & ((1 << n) - 1)

    def read_bit(self) -> int:
        pos = self.pos
        if pos >= self._nbits:
            raise VorbisError("bitstream exhausted")
        win, winbits = self._win, self._winbits
        if not winbits:
            win = self._data[self._bytepos]
            self._bytepos += 1
            winbits = 8
        self._win = win >> 1
        self._winbits = winbits - 1
        self.pos = pos + 1
        return win & 1


def ilog(x: int) -> int:
    """§9.2.1: number of bits needed for x (ilog(0)=0, ilog(7)=3)."""
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def float32_unpack(x: int) -> float:
    """§9.2.2: Vorbis packed float."""
    mantissa = x & 0x1FFFFF
    sign = x & 0x80000000
    exponent = (x & 0x7FE00000) >> 21
    v = mantissa * (2.0 ** (exponent - 788))
    return -v if sign else v


# ---------------------------------------------------------------------------
# Codebooks (§3)
# ---------------------------------------------------------------------------


def assign_codewords(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical first-fit assignment (§3.2.1): each used entry takes the
    lowest-valued (left-justified) free node at its depth, in entry order.
    Returns entry -> (codeword, length)."""
    # free subtrees as (left-justified code, depth); start = whole tree
    avail: list[tuple[int, int]] = [(0, 0)]
    out: dict[int, tuple[int, int]] = {}
    used = [l for l in lengths if l > 0]
    single = len(used) == 1
    for entry, l in enumerate(lengths):
        if l <= 0:
            continue
        if single:
            # single-used-entry special case: decode consumes ONE bit
            # (codeword 0) regardless of the listed length — the listed
            # length only matters for multi-entry trees
            out[entry] = (0, 1)
            continue
        # deepest free subtree with depth <= l among lowest codes
        cand = None
        for i, (code, depth) in enumerate(avail):
            if depth <= l:
                cand = i
                break
        if cand is None:
            raise VorbisError("overspecified huffman tree")
        code, depth = avail.pop(cand)
        # descend left to depth l; right branches become free subtrees
        for d in range(depth, l):
            right = code | (1 << (31 - d))
            avail.append((right, d + 1))
        avail.sort()
        out[entry] = (code >> (32 - l), l)
    return out


@dataclass
class Codebook:
    dimensions: int
    entries: int
    lengths: list[int]
    lookup_type: int
    minimum: float = 0.0
    delta: float = 0.0
    sequence_p: int = 0
    multiplicands: list[int] = field(default_factory=list)
    lookup_values: int = 0

    def __post_init__(self):
        cw = assign_codewords(self.lengths)
        # (length, code) -> entry for bit-at-a-time decode
        self._dec = {(l, c): e for e, (c, l) in cw.items()}
        self._maxlen = max((l for l in self.lengths if l > 0), default=0)
        if self.lookup_type:
            self._vq = self._build_vq()

    def _build_vq(self) -> np.ndarray:
        """entry x dim value table (§3.3), sequence_p applied."""
        d = self.dimensions
        vals = np.zeros((self.entries, d), dtype=np.float64)
        mult = self.multiplicands
        for e in range(self.entries):
            last = 0.0
            if self.lookup_type == 1:
                idiv = 1
                for i in range(d):
                    off = (e // idiv) % self.lookup_values
                    v = mult[off] * self.delta + self.minimum + last
                    vals[e, i] = v
                    if self.sequence_p:
                        last = v
                    idiv *= self.lookup_values
            else:
                for i in range(d):
                    v = mult[e * d + i] * self.delta + self.minimum + last
                    vals[e, i] = v
                    if self.sequence_p:
                        last = v
        return vals

    def decode_scalar(self, br: BitReader) -> int:
        code = 0
        for length in range(1, self._maxlen + 1):
            code = (code << 1) | br.read_bit()
            e = self._dec.get((length, code))
            if e is not None:
                return e
        raise VorbisError("invalid huffman codeword")

    def decode_vector(self, br: BitReader) -> np.ndarray:
        if not self.lookup_type:
            raise VorbisError("scalar codebook used in VQ context")
        return self._vq[self.decode_scalar(br)]


def read_codebook(br: BitReader) -> Codebook:
    if br.read(24) != 0x564342:  # 'BCV'
        raise VorbisError("codebook sync lost")
    dimensions = br.read(16)
    entries = br.read(24)
    if dimensions == 0:
        # a 0-dim book would spin _lookup1_values and the residue VQ
        # loops forever — corrupt stream, fail loudly
        raise VorbisError("codebook with zero dimensions")
    if entries * dimensions > (1 << 20):
        # a 21-byte adversarial packet can otherwise demand a multi-GB
        # VQ table (entries is a raw 24-bit field); real codebooks are
        # a few thousand entries x <=16 dims, so this cap is generous
        # while keeping the worst-case parse bounded
        raise VorbisError(
            f"implausible codebook size {entries}x{dimensions}"
        )
    ordered = br.read_bit()
    lengths = [0] * entries
    if not ordered:
        sparse = br.read_bit()
        for i in range(entries):
            if sparse:
                if br.read_bit():
                    lengths[i] = br.read(5) + 1
            else:
                lengths[i] = br.read(5) + 1
    else:
        cur_len = br.read(5) + 1
        cur = 0
        while cur < entries:
            num = br.read(ilog(entries - cur))
            if cur + num > entries:
                raise VorbisError("ordered codebook overflow")
            for i in range(cur, cur + num):
                lengths[i] = cur_len
            cur += num
            cur_len += 1
    lookup_type = br.read(4)
    if lookup_type not in (0, 1, 2):
        raise VorbisError(f"codebook lookup type {lookup_type}")
    minimum = delta = 0.0
    seq = 0
    mult: list[int] = []
    lookup_values = 0
    if lookup_type:
        minimum = float32_unpack(br.read(32))
        delta = float32_unpack(br.read(32))
        value_bits = br.read(4) + 1
        seq = br.read_bit()
        if lookup_type == 1:
            lookup_values = _lookup1_values(entries, dimensions)
            if lookup_values == 0:
                raise VorbisError("type-1 lookup with zero values")
            count = lookup_values
        else:
            count = entries * dimensions
        mult = [br.read(value_bits) for _ in range(count)]
    return Codebook(
        dimensions, entries, lengths, lookup_type,
        minimum, delta, seq, mult, lookup_values,
    )


def _lookup1_values(entries: int, dim: int) -> int:
    """Largest integer v with v**dim <= entries (§9.2.3)."""
    v = int(math.floor(entries ** (1.0 / dim))) if dim else 0
    while (v + 1) ** dim <= entries:
        v += 1
    while v > 0 and v ** dim > entries:
        v -= 1
    return v


# ---------------------------------------------------------------------------
# Setup-header component configs
# ---------------------------------------------------------------------------


@dataclass
class Floor1:
    partition_class_list: list[int]
    class_dimensions: list[int]
    class_subclasses: list[int]
    class_masterbooks: list[int]
    subclass_books: list[list[int]]
    multiplier: int
    x_list: list[int]

    def __post_init__(self):
        # the sort order and low/high neighbors depend only on x_list —
        # precompute once at setup time instead of per frame per channel
        # (libvorbis does the same at look-init)
        self.sort_order = sorted(
            range(len(self.x_list)), key=lambda i: self.x_list[i]
        )
        self.lo_neighbor = [0, 0] + [
            _low_neighbor(self.x_list, i)
            for i in range(2, len(self.x_list))
        ]
        self.hi_neighbor = [0, 0] + [
            _high_neighbor(self.x_list, i)
            for i in range(2, len(self.x_list))
        ]


@dataclass
class Residue:
    rtype: int
    begin: int
    end: int
    partition_size: int
    classifications: int
    classbook: int
    cascade: list[int]
    books: list[list[int]]  # [class][pass] (-1 = unused)


@dataclass
class Mapping:
    submaps: int
    coupling: list[tuple[int, int]]  # (magnitude_ch, angle_ch)
    mux: list[int]
    submap_floor: list[int]
    submap_residue: list[int]


@dataclass
class Mode:
    blockflag: int
    mapping: int


@dataclass
class VorbisSetup:
    channels: int
    rate: int
    blocksizes: tuple[int, int]
    codebooks: list[Codebook]
    floors: list[Floor1]
    residues: list[Residue]
    mappings: list[Mapping]
    modes: list[Mode]


_RANGES = (256, 128, 86, 64)


def _read_floor1(br: BitReader, n_books: int) -> Floor1:
    partitions = br.read(5)
    class_list = [br.read(4) for _ in range(partitions)]
    max_class = max(class_list, default=-1)
    dims, subs, masters, subbooks = [], [], [], []
    for _ in range(max_class + 1):
        dims.append(br.read(3) + 1)
        sc = br.read(2)
        subs.append(sc)
        masters.append(br.read(8) if sc else -1)
        row = []
        for _ in range(1 << sc):
            row.append(br.read(8) - 1)
        subbooks.append(row)
    for b in masters:
        if b >= n_books:
            raise VorbisError("floor1 masterbook out of range")
    for row in subbooks:
        for b in row:
            if b >= n_books:  # -1 (unused) is legal
                raise VorbisError("floor1 subclass book out of range")
    multiplier = br.read(2) + 1
    rangebits = br.read(4)
    x_list = [0, 1 << rangebits]
    for i in range(partitions):
        for _ in range(dims[class_list[i]]):
            x_list.append(br.read(rangebits))
    if len(set(x_list)) != len(x_list):
        raise VorbisError("floor1 duplicate X positions")
    return Floor1(class_list, dims, subs, masters, subbooks,
                  multiplier, x_list)


def _read_residue(br: BitReader, rtype: int, n_books: int) -> Residue:
    begin = br.read(24)
    end = br.read(24)
    psize = br.read(24) + 1
    classifications = br.read(6) + 1
    classbook = br.read(8)
    if classbook >= n_books:
        raise VorbisError("residue classbook out of range")
    cascade = []
    for _ in range(classifications):
        high = 0
        low = br.read(3)
        if br.read_bit():
            high = br.read(5)
        cascade.append(high * 8 + low)
    books: list[list[int]] = []
    for c in range(classifications):
        row = []
        for bit in range(8):
            if cascade[c] & (1 << bit):
                b = br.read(8)
                if b >= n_books:
                    raise VorbisError("residue book out of range")
                row.append(b)
            else:
                row.append(-1)
        books.append(row)
    return Residue(rtype, begin, end, psize, classifications,
                   classbook, cascade, books)


def parse_headers(packets: list[bytes]) -> VorbisSetup:
    """Parse identification + setup headers (comment header skipped)."""
    if len(packets) < 3:
        raise VorbisError("need 3 header packets")
    ident, _comment, setup = packets[0], packets[1], packets[2]
    if len(ident) < 30:
        raise VorbisError("truncated identification header")
    if ident[:7] != b"\x01vorbis":
        raise VorbisError("bad identification header")
    if struct.unpack_from("<I", ident, 7)[0] != 0:
        raise VorbisError("unsupported vorbis version")
    channels = ident[11]
    rate = struct.unpack_from("<I", ident, 12)[0]
    bs_byte = ident[28]
    bs0 = 1 << (bs_byte & 0x0F)
    bs1 = 1 << (bs_byte >> 4)
    if not (64 <= bs0 <= 8192 and bs0 <= bs1 <= 8192):
        raise VorbisError(f"illegal blocksizes {bs0}/{bs1}")
    if not channels or not rate:
        raise VorbisError("zero channels or rate")
    if setup[:7] != b"\x05vorbis":
        raise VorbisError("bad setup header")
    br = BitReader(setup[7:])
    codebooks = [read_codebook(br) for _ in range(br.read(8) + 1)]
    for _ in range(br.read(6) + 1):  # time domain transforms (all zero)
        if br.read(16) != 0:
            raise VorbisError("nonzero time-domain transform")
    floors: list[Floor1] = []
    for _ in range(br.read(6) + 1):
        ftype = br.read(16)
        if ftype == 1:
            floors.append(_read_floor1(br, len(codebooks)))
        elif ftype == 0:
            raise VorbisError(
                "floor type 0 (LSP) not supported — deprecated; no "
                "mainstream encoder emits it"
            )
        else:
            raise VorbisError(f"floor type {ftype}")
    residues: list[Residue] = []
    for _ in range(br.read(6) + 1):
        rtype = br.read(16)
        if rtype not in (0, 1, 2):
            raise VorbisError(f"residue type {rtype}")
        residues.append(_read_residue(br, rtype, len(codebooks)))
    mappings: list[Mapping] = []
    for _ in range(br.read(6) + 1):
        if br.read(16) != 0:
            raise VorbisError("nonzero mapping type")
        submaps = (br.read(4) + 1) if br.read_bit() else 1
        coupling: list[tuple[int, int]] = []
        if br.read_bit():
            steps = br.read(8) + 1
            bits = ilog(channels - 1)
            for _ in range(steps):
                m = br.read(bits)
                a = br.read(bits)
                if m == a or m >= channels or a >= channels:
                    raise VorbisError("illegal coupling pair")
                coupling.append((m, a))
        if br.read(2) != 0:
            raise VorbisError("mapping reserved bits set")
        mux = [br.read(4) for _ in range(channels)] if submaps > 1 \
            else [0] * channels
        if any(m >= submaps for m in mux):
            raise VorbisError("mapping mux out of submap range")
        sf, sr = [], []
        for _ in range(submaps):
            br.read(8)  # unused time config
            sf.append(br.read(8))
            sr.append(br.read(8))
        for f in sf:
            if f >= len(floors):
                raise VorbisError("submap floor out of range")
        for r in sr:
            if r >= len(residues):
                raise VorbisError("submap residue out of range")
        mappings.append(Mapping(submaps, coupling, mux, sf, sr))
    modes: list[Mode] = []
    for _ in range(br.read(6) + 1):
        blockflag = br.read_bit()
        if br.read(16) != 0 or br.read(16) != 0:
            raise VorbisError("nonzero window/transform type")
        mapping = br.read(8)
        if mapping >= len(mappings):
            raise VorbisError("mode mapping out of range")
        modes.append(Mode(blockflag, mapping))
    if not br.read_bit():
        raise VorbisError("setup framing bit unset")
    return VorbisSetup(channels, rate, (bs0, bs1), codebooks,
                       floors, residues, mappings, modes)


# ---------------------------------------------------------------------------
# Floor 1 curve decode + synthesis (§7.2)
# ---------------------------------------------------------------------------

#: §7.2.2's 256-entry table, regenerated geometrically through its two
#: published endpoints (constant-ratio sequence; ~1e-5 relative agreement)
FLOOR1_INVERSE_DB_TABLE = (
    1.0649863e-07
    * (0.99308571 / 1.0649863e-07) ** (np.arange(256) / 255.0)
).astype(np.float64)


def _low_neighbor(x: list[int], n: int) -> int:
    best, bx = 0, None
    for i in range(n):
        if x[i] < x[n] and (bx is None or x[i] > bx):
            best, bx = i, x[i]
    return best


def _high_neighbor(x: list[int], n: int) -> int:
    best, bx = 0, None
    for i in range(n):
        if x[i] > x[n] and (bx is None or x[i] < bx):
            best, bx = i, x[i]
    return best


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int,
                 v: np.ndarray) -> None:
    """Integer Bresenham per §7.2.4 step 2 (writes dB-domain integers into
    v over [x0, x1); base truncates toward zero like the spec's integer
    division)."""
    dy = y1 - y0
    adx = x1 - x0
    base = int(dy / adx) if adx else 0  # truncate toward zero
    ady = abs(dy) - abs(base) * adx
    sy = base + 1 if dy >= 0 else base - 1
    y = y0
    err = 0
    n = len(v)
    if x0 < n:
        v[x0] = y0
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y


def decode_floor1(br: BitReader, fl: Floor1, books: list[Codebook],
                  n_half: int) -> np.ndarray | None:
    """Returns the floor curve (length n_half) or None when the channel
    is unused this frame."""
    if not br.read_bit():
        return None
    rng = _RANGES[fl.multiplier - 1]
    ybits = ilog(rng - 1)
    y = [br.read(ybits), br.read(ybits)]
    for cls in fl.partition_class_list:
        cdim = fl.class_dimensions[cls]
        cbits = fl.class_subclasses[cls]
        csub = (1 << cbits) - 1
        cval = 0
        if cbits:
            cval = books[fl.class_masterbooks[cls]].decode_scalar(br)
        for _ in range(cdim):
            book = fl.subclass_books[cls][cval & csub]
            cval >>= cbits
            if book >= 0:
                y.append(books[book].decode_scalar(br))
            else:
                y.append(0)
    # amplitude synthesis (§7.2.4 step 1)
    values = len(fl.x_list)
    final_y = [0] * values
    step2 = [False] * values
    step2[0] = step2[1] = True
    final_y[0] = y[0]
    final_y[1] = y[1]
    for i in range(2, values):
        lo = fl.lo_neighbor[i]
        hi = fl.hi_neighbor[i]
        pred = _render_point(fl.x_list[lo], final_y[lo],
                             fl.x_list[hi], final_y[hi], fl.x_list[i])
        val = y[i]
        highroom = rng - pred
        lowroom = pred
        room = 2 * min(highroom, lowroom)
        if val:
            step2[lo] = True
            step2[hi] = True
            step2[i] = True
            if val >= room:
                if highroom > lowroom:
                    final_y[i] = val - lowroom + pred
                else:
                    final_y[i] = pred - val + highroom - 1
            else:
                if val & 1:
                    final_y[i] = pred - ((val + 1) // 2)
                else:
                    final_y[i] = pred + (val // 2)
        else:
            step2[i] = False
            final_y[i] = pred
    # curve synthesis (§7.2.4 step 2): render integers, then table-map
    order = fl.sort_order
    ybuf = np.zeros(n_half, dtype=np.int64)
    lx = 0
    ly = (final_y[order[0]] & 0x7FFF) * fl.multiplier
    hx = 0
    hy = ly
    for idx in order[1:]:
        if not step2[idx]:
            continue
        hy = (final_y[idx] & 0x7FFF) * fl.multiplier
        hx = fl.x_list[idx]
        _render_line(lx, ly, hx, hy, ybuf)
        lx, ly = hx, hy
    if hx < n_half:
        ybuf[hx:n_half] = hy  # horizontal continuation
    np.clip(ybuf, 0, 255, out=ybuf)
    return FLOOR1_INVERSE_DB_TABLE[ybuf]


# ---------------------------------------------------------------------------
# Residue decode (§8.6)
# ---------------------------------------------------------------------------


def decode_residue(br: BitReader, res: Residue, books: list[Codebook],
                   do_not_decode: list[bool], n_half: int) -> np.ndarray:
    """Returns (ch, n_half) float64 residue vectors."""
    ch = len(do_not_decode)
    if res.rtype == 2:
        # interleaved: one pseudo-channel of ch*n_half, decoded as type 1
        any_decode = not all(do_not_decode)
        vec = _residue_inner(br, res, books, 1,
                             [not any_decode], ch * n_half, rtype=1)
        out = np.zeros((ch, n_half), dtype=np.float64)
        for c in range(ch):
            out[c] = vec[0][c::ch]
        return out
    return _residue_inner(br, res, books, ch, do_not_decode, n_half,
                          rtype=res.rtype)


def _residue_inner(br: BitReader, res: Residue, books: list[Codebook],
                   ch: int, do_not_decode: list[bool], vec_len: int,
                   rtype: int) -> np.ndarray:
    out = np.zeros((ch, vec_len), dtype=np.float64)
    begin = min(res.begin, vec_len)
    end = min(res.end, vec_len)
    if end <= begin:
        return out
    psize = res.partition_size
    n_parts = (end - begin) // psize
    classbook = books[res.classbook]
    cw_per = classbook.dimensions
    n_groups = (n_parts + cw_per - 1) // cw_per if cw_per else 0
    classes = [[0] * (n_groups * cw_per) for _ in range(ch)]
    # highest set cascade bit = number of VQ passes
    max_pass = 0
    for c in res.cascade:
        for bit in range(8):
            if c & (1 << bit):
                max_pass = max(max_pass, bit)
    for p in range(max_pass + 1):
        for g in range(n_groups):
            for c in range(ch):
                if do_not_decode[c]:
                    continue
                if p == 0:
                    temp = classbook.decode_scalar(br)
                    for i in range(cw_per - 1, -1, -1):
                        classes[c][g * cw_per + i] = \
                            temp % res.classifications
                        temp //= res.classifications
            for s in range(cw_per):
                part = g * cw_per + s
                if part >= n_parts:
                    break
                for c in range(ch):
                    if do_not_decode[c]:
                        continue
                    cls = classes[c][part]
                    book_no = res.books[cls][p]
                    if book_no < 0:
                        continue
                    book = books[book_no]
                    off = begin + part * psize
                    if rtype == 0:
                        step = psize // book.dimensions
                        for j in range(step):
                            v = book.decode_vector(br)
                            for d in range(book.dimensions):
                                out[c][off + j + d * step] += v[d]
                    else:  # type 1 (and the type-2 inner call)
                        i = 0
                        while i < psize:
                            v = book.decode_vector(br)
                            out[c][off + i : off + i + book.dimensions] += v
                            i += book.dimensions
    return out


# ---------------------------------------------------------------------------
# Transform + window (§4.3.8/4.3.9, §A)
# ---------------------------------------------------------------------------

_imdct_cache: dict[int, np.ndarray] = {}


def imdct_slow(spec: np.ndarray) -> np.ndarray:
    """Slow-form inverse MDCT (the §A.2 definition, verification
    baseline): n/2 coeffs -> n samples,
    out[j] = sum_k spec[k] cos(pi/(2n) (2j+1+n/2)(2k+1))."""
    n2 = len(spec)
    n = 2 * n2
    mat = _imdct_cache.get(n)
    if mat is None:
        j = np.arange(n).reshape(-1, 1)
        k = np.arange(n2).reshape(1, -1)
        mat = np.cos(np.pi / (2 * n) * (2 * j + 1 + n2) * (2 * k + 1))
        _imdct_cache[n] = mat
    return mat @ spec


_imdct_tw_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def imdct(spec: np.ndarray) -> np.ndarray:
    """O(n log n) inverse MDCT (production path; r7 VERDICT #3 — real
    corpora use 2048-sample long blocks where the O(n^2) matrix form
    matters).

    Reduction: with N = n/2 coeffs, the kernel angle rewrites as
    pi/N (j + (1+N)/2)(k + 1/2), i.e. out[j] = c[j + N/2] where
    c[t] = sum_k X[k] cos(pi/N (t+1/2)(k+1/2)) is the DCT-IV of X.
    The cos-extension identities c[2N-1-t] = -c[t] (t -> 2N-1-t) and
    c[t+2N] = -c[t] fold the out-of-range indices, giving
    out = [c[N/2:], -c[::-1], -c[:N/2]].  c itself is one zero-padded
    2N-point inverse FFT with pre/post twiddles (cos th = Re e^{i th}).
    Agreement with imdct_slow is ~1e-12 relative (equality-tested on all
    fixtures and random spectra across block sizes)."""
    x = np.asarray(spec, dtype=np.float64)
    n2 = len(x)
    tw = _imdct_tw_cache.get(n2)
    if tw is None:
        k = np.arange(n2)
        pre = np.exp(1j * np.pi * k / (2 * n2))
        t = np.arange(n2)
        post = np.exp(1j * np.pi * (t + 0.5) / (2 * n2))
        tw = (pre, post)
        _imdct_tw_cache[n2] = tw
    pre, post = tw
    y = np.zeros(2 * n2, dtype=np.complex128)
    y[:n2] = x * pre
    c = (post * (np.fft.ifft(y)[:n2] * (2 * n2))).real
    h = n2 // 2
    return np.concatenate([c[h:], -c[::-1], -c[:h]])


_window_cache: dict[tuple[int, int, int, int], np.ndarray] = {}


def vorbis_window(n: int, left: int, right: int) -> np.ndarray:
    """§4.3.8: window for a block of size n whose left/right overlap
    regions have sizes ``left``/``right`` (short slopes centered inside a
    long block on transitions)."""
    key = (n, left, right, 0)
    w = _window_cache.get(key)
    if w is not None:
        return w
    w = np.zeros(n, dtype=np.float64)
    # §4.3.8: slopes centered on the block's quarter points — a full-size
    # slope (left == n/2) starts at 0; a short slope inside a long block
    # starts at n/4 - left/2
    left_start = n // 4 - left // 2 if left != n // 2 else 0
    right_start = 3 * n // 4 - right // 2 if right != n // 2 else n // 2
    x = (np.arange(left) + 0.5) / left * (np.pi / 2)
    slope_l = np.sin(np.pi / 2 * np.sin(x) ** 2)
    x = (np.arange(right) + 0.5) / right * (np.pi / 2)
    slope_r = np.sin(np.pi / 2 * np.sin(x) ** 2)[::-1]
    w[left_start : left_start + left] = slope_l
    w[left_start + left : right_start] = 1.0
    w[right_start : right_start + right] = slope_r
    _window_cache[key] = w
    return w


# ---------------------------------------------------------------------------
# Full decode
# ---------------------------------------------------------------------------


def decode_vorbis(content: bytes) -> tuple[np.ndarray, int]:
    """Ogg/Vorbis bytes -> (float32 mono samples in [-1, 1], rate).

    Every malformed-stream failure mode surfaces as :class:`VorbisError`:
    field validation covers the known corruption shapes, and a backstop
    converts any residual index/arithmetic/struct error from adversarial
    bytes — a corrupt blob in a 100 TB corpus must fail TYPED, never hang
    or kill the task with an anonymous exception."""
    try:
        return _decode_vorbis(content)
    except VorbisError:
        raise
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            struct.error) as exc:
        raise VorbisError(f"malformed stream: {exc!r}") from exc


def _decode_vorbis(content: bytes) -> tuple[np.ndarray, int]:
    packets, last_granule = _ogg_parse(content)
    setup = parse_headers(packets)
    ch = setup.channels
    bs = setup.blocksizes
    pcm_chunks: list[np.ndarray] = []
    prev_right: np.ndarray | None = None  # (ch, prev_n/2) tail
    prev_n = 0
    mode_bits = ilog(len(setup.modes) - 1)
    for pkt in packets[3:]:
        if not pkt:
            continue
        br = BitReader(pkt)
        if br.read_bit() != 0:
            raise VorbisError("audio packet with header type bit set")
        mode = setup.modes[br.read(mode_bits) if mode_bits else 0]
        n = bs[mode.blockflag]
        long_block = mode.blockflag == 1
        prev_flag = next_flag = 1
        if long_block:
            # §4.3.1: a long-block mode ALWAYS carries the two window
            # flags, even when blocksize_0 == blocksize_1
            prev_flag = br.read_bit()
            next_flag = br.read_bit()
        mapping = setup.mappings[mode.mapping]
        n_half = n // 2
        # floors
        floors: list[np.ndarray | None] = []
        for c in range(ch):
            fl = setup.floors[mapping.submap_floor[mapping.mux[c]]]
            floors.append(decode_floor1(br, fl, setup.codebooks, n_half))
        no_residue = [f is None for f in floors]
        # §4.3.3: coupling forces both halves of a pair to decode if
        # either side has a nonzero floor
        for (m, a) in mapping.coupling:
            if not no_residue[m] or not no_residue[a]:
                no_residue[m] = no_residue[a] = False
        # residues per submap
        residue_vec = np.zeros((ch, n_half), dtype=np.float64)
        for sub in range(mapping.submaps):
            chans = [c for c in range(ch) if mapping.mux[c] == sub]
            dnd = [no_residue[c] for c in chans]
            res = setup.residues[mapping.submap_residue[sub]]
            dec = decode_residue(br, res, setup.codebooks, dnd, n_half)
            for i, c in enumerate(chans):
                residue_vec[c] = dec[i]
        # inverse coupling (§4.3.5), reverse order
        for (mi, ai) in reversed(mapping.coupling):
            m = residue_vec[mi]
            a = residue_vec[ai]
            # §4.3.5 square-polar: the angle vector holds the +/- offset
            # from the magnitude, folded by both signs
            new_m = m.copy()
            new_a = a.copy()
            pos_m = m > 0
            pos_a = a > 0
            idx = pos_m & pos_a
            new_a[idx] = m[idx] - a[idx]
            idx = pos_m & ~pos_a
            new_a[idx] = m[idx]
            new_m[idx] = m[idx] + a[idx]
            idx = ~pos_m & pos_a
            new_a[idx] = m[idx] + a[idx]
            idx = ~pos_m & ~pos_a
            new_a[idx] = m[idx]
            new_m[idx] = m[idx] - a[idx]
            residue_vec[mi] = new_m
            residue_vec[ai] = new_a
        # dot product + IMDCT + window
        frame = np.zeros((ch, n), dtype=np.float64)
        left = bs[0] // 2 if (long_block and not prev_flag) else n // 2
        right = bs[0] // 2 if (long_block and not next_flag) else n // 2
        if not long_block:
            left = right = n // 2
        win = vorbis_window(n, left, right)
        for c in range(ch):
            if floors[c] is None:
                continue  # stays zero
            spec = floors[c] * residue_vec[c]
            frame[c] = imdct(spec) * win
        # overlap-add (§4.3.9): the returned region for a frame pair runs
        # from the previous window's center to this window's center
        # (prev_n/4 + n/4 samples); the slope regions are center-aligned
        # in absolute time, and anything either window can't reach there
        # is zero by construction
        if prev_right is not None:
            out_len = prev_n // 4 + n // 4
            mixed = np.zeros((ch, out_len), dtype=np.float64)
            p = prev_right[:, : min(prev_right.shape[1], out_len)]
            mixed[:, : p.shape[1]] += p
            cur_left = frame[:, : n // 2]
            off = out_len - n // 2
            if off >= 0:
                mixed[:, off:] += cur_left
            else:
                mixed += cur_left[:, -off:]
            pcm_chunks.append(mixed)
        prev_right = frame[:, n // 2 :]
        prev_n = n
    if not pcm_chunks:
        return np.zeros(0, dtype=np.float32), setup.rate
    pcm = np.concatenate(pcm_chunks, axis=1)
    mono = pcm.mean(axis=0) if ch > 1 else pcm[0]
    # real encoders pad the final block and record the true PCM length in
    # the last page's granule position — trim the padding (a granule of 0
    # or beyond the synthesized length means no trim)
    if 0 < last_granule < len(mono):
        mono = mono[:last_granule]
    return np.clip(mono, -1.0, 1.0).astype(np.float32), setup.rate


# ---------------------------------------------------------------------------
# Fixture encoder: a minimal legal mono stream whose spectrum is a single
# MDCT bin — used by the mm8 oracle pair and smoke tests.  (The decode
# tests in tests/test_vorbis.py keep their own INDEPENDENT bit writer;
# this one exists so driver-gated queries can synthesize decodable
# payloads per row.)
# ---------------------------------------------------------------------------


def _pack_lsb(bits: list[int]) -> bytes:
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i >> 3] |= 1 << (i & 7)
    return bytes(out)


class _BW:
    def __init__(self):
        self.bits: list[int] = []

    def w(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def cw(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)


def _fixture_ogg_page(serial: int, seq: int, granule: int,
                      packets: list[bytes], header_type: int = 0) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        body += p
        full, rem = divmod(len(p), 255)
        lacing += b"\xff" * full
        lacing.append(rem)
    page = bytearray(
        b"OggS" + bytes([0, header_type])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)]) + bytes(lacing) + bytes(body)
    )
    page[22:26] = struct.pack("<I", ogg_crc(bytes(page)))
    return bytes(page)


def encode_test_tone(bin_k: int, n_frames: int, rate: int = 8000) -> bytes:
    """Minimal legal Ogg/Vorbis stream (mono, blocksizes 256/256, flat
    floor1, one type-1 residue pass) whose decoded spectrum is amplitude
    0.25 x floor at MDCT bin ``bin_k`` (must lie in [32, 64) — the
    residue partition carrying values).  Decodes to a steady tone at
    (bin_k + 0.5) * rate / 256 Hz."""
    if not 32 <= bin_k < 64:
        raise ValueError("bin_k must be in [32, 64)")
    codes = assign_codewords([4] * 16)
    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
        + struct.pack("<I", rate) + struct.pack("<iii", 0, 0, 0)
        + bytes([0x88, 0x01])
    )
    vendor = b"tulflow-fixture"
    comment = (
        b"\x03vorbis" + struct.pack("<I", len(vendor)) + vendor
        + struct.pack("<I", 0) + bytes([0x01])
    )
    s = _BW()
    s.w(1, 8)
    for lookup in (0, 1):
        s.w(0x564342, 24)
        s.w(4, 16)
        s.w(16, 24)
        s.w(0, 1)
        s.w(0, 1)
        for _ in range(16):
            s.w(3, 5)
        if not lookup:
            s.w(0, 4)
        else:
            s.w(1, 4)
            s.w(788 << 21, 32)            # minimum 0.0
            s.w((786 << 21) | 1, 32)      # delta 0.25
            s.w(0, 4)
            s.w(0, 1)
            s.w(0, 1)
            s.w(1, 1)
    s.w(0, 6); s.w(0, 16)                 # time transforms
    s.w(0, 6); s.w(1, 16)                 # one floor, type 1
    s.w(0, 5); s.w(0, 2); s.w(7, 4)       # partitions 0, mult 1, range 7
    s.w(0, 6); s.w(1, 16)                 # one residue, type 1
    s.w(0, 24); s.w(128, 24); s.w(31, 24)
    s.w(1, 6); s.w(0, 8)                  # 2 classes, classbook 0
    s.w(0, 3); s.w(0, 1)                  # class 0: no books
    s.w(1, 3); s.w(0, 1)                  # class 1: pass-0 book
    s.w(1, 8)
    s.w(0, 6); s.w(0, 16)                 # one mapping, type 0
    s.w(0, 1); s.w(0, 1); s.w(0, 2)       # 1 submap, no coupling
    s.w(0, 8); s.w(0, 8); s.w(0, 8)       # submap time/floor/residue
    s.w(0, 6); s.w(0, 1)                  # one mode, short blocks
    s.w(0, 16); s.w(0, 16); s.w(0, 8)
    s.w(1, 1)                             # framing
    setup = b"\x05vorbis" + _pack_lsb(s.bits)

    a = _BW()
    a.w(0, 1)          # audio packet (one mode: zero mode bits)
    a.w(1, 1)          # floor nonzero
    a.w(255, 8)
    a.w(255, 8)
    c, l = codes[4]    # classword: classes [0,1,0,0]
    a.cw(c, l)
    off = bin_k - 32
    for j in range(8):
        entry = (1 << (off % 4)) if j == off // 4 else 0
        c, l = codes[entry]
        a.cw(c, l)
    audio = _pack_lsb(a.bits)

    serial = 0x7075
    pages = [
        _fixture_ogg_page(serial, 0, 0, [ident], header_type=2),
        _fixture_ogg_page(serial, 1, 0, [comment, setup]),
    ]
    samples = 0
    for i in range(n_frames):
        samples += 128 if i else 0
        pages.append(
            _fixture_ogg_page(
                serial, len(pages), samples, [audio],
                header_type=4 if i == n_frames - 1 else 0,
            )
        )
    return b"".join(pages)


__all__ = [
    "BitReader",
    "Codebook",
    "VorbisError",
    "assign_codewords",
    "decode_vorbis",
    "encode_test_tone",
    "float32_unpack",
    "ilog",
    "imdct",
    "imdct_slow",
    "ogg_packets",
    "parse_headers",
    "vorbis_window",
]
