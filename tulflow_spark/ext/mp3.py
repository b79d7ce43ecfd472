"""Stdlib+numpy MPEG-1 Audio Layer III decoder — closes the MP3 half of
the audio wall the way ext/vorbis.py closed Ogg/Vorbis (r7 VERDICT #2):
real bit-level decode with no ffmpeg/mad in the container.

Scope (ISO/IEC 11172-3, layer III; frame layout also public in the
MPEG-1 audio overview literature):

- frame sync walk (11-bit sync, MPEG-1 Layer III headers, bitrate /
  sample-rate tables, padding), ID3v2 skip, typed errors for free-format
  and reserved fields.
- side information (§2.4.1.7): main_data_begin, scfsi, and both
  granules' part2_3_length / big_values / global_gain /
  scalefac_compress / window-switching block, for mono and stereo.
- bit reservoir (§2.4.2.7 main_data_begin): main data is decoded from a
  rolling reservoir of previous frames' main-data bytes; frames whose
  back-pointer precedes available history are skipped (decoder startup
  rule), and the reservoir is bounded at the spec's 511 bytes.
- scalefactors (§2.4.2.7 slen1/slen2 pairs, scfsi reuse groups, long /
  short / mixed layouts).
- Huffman spectral decode (§2.4.2.7): big-value region split by the
  region0/region1 scalefactor-band boundaries, linbits escapes, sign
  bits, count1 quadruples, rzero tail.  Code tables live in a REGISTRY
  (`BIG_VALUE_TABLES` / `COUNT1_TABLES`): ISO Table B.7 is a pure data
  table; the registry ships the entries transcribed here (tables 0-3,
  5-9, 12 and count1 tables A and B) and raises a typed `Mp3Error`
  naming any
  table a stream requests that is not transcribed — extending it is
  mechanical data entry, no code.  Transcriptions are ADMITTED only
  when the first honest transcription passes `_tbl_mat`'s
  complete-prefix-code gate (pairwise prefix-free + Kraft equality —
  a corrupted n*n table passing by chance is implausible, while
  ITERATING a recalled table against the gate until it closes would
  manufacture a plausible-but-wrong code); tables 10, 11, 13, 15, 16
  and 24 failed first-transcription validation and remain typed
  walls (r15: re-attempt declined — the 64-/256-entry code matrices
  exceed reliable recall and the contract forbids iterating against
  the gate; instead the ESC alias registry (`ESC_LINBITS`) ships the
  spec's structural 16-31 linbits column, so the outstanding entry
  is six base matrices covering twenty-two selectors, and the typed
  wall now names the base matrix a stream needs).  In-repo fixtures
  are SELF-CONSISTENT: the test
  encoder writes codes from the same registry, and the golden
  expectations are analytic in the SIGNAL domain (tone frequency), the
  ext/vorbis.py strategy.
- requantization (§2.4.3.4 power law |is|^(4/3) with global_gain,
  scalefac_scale multiplier, preflag/pretab, subblock_gain), short-block
  reordering, MS stereo (mode extension bit 1; intensity stereo is a
  typed wall), alias reduction (§2.4.3.5 — the eight butterfly
  coefficients ci are spec constants), 36/12-point IMDCT with the four
  block-type windows (analytic sine windows, §2.4.3.6) and per-subband
  overlap-add, frequency inversion.
- polyphase synthesis (§2.4.3.7): the exact cosine modulation
  N[j,s] = cos((16+j)(2s+1)·pi/64) and 16-slot polyphase history, with
  one documented deviation: the spec's synthesis window D is a LITERAL
  512-entry data table (Annex B Table 3-B.3, not reproducible from a
  formula); this module uses an analytically generated near-equivalent
  (Blackman-windowed sinc low-pass prototype at the same pi/64 cutoff,
  unit passband gain).  Tone positions, band mapping, and the whole
  upstream bit-exact chain are unaffected; a stream whose tables ARE in
  the registry decodes with a small amplitude-ripple deviation from
  conformant decoders (same contract as the documented
  floor1_inverse_dB_table approximation in ext/vorbis.py).  Swap in the
  literal table for conformance parity.

Real-world compatibility, stated plainly: most third-party MP3s select
Huffman tables outside the transcribed subset and will raise the typed
registry error — the LIMITING factor for real files is the table
registry, not the window approximation.  The decode PIPELINE (reservoir,
scalefactors, stereo, hybrid filterbank) is complete; per-table data
entry is the only gap.

Opus and H.264 remain typed walls (`ext/multimodal.py`);
`ext/mediaprobe.py` still frame-walks MP3 headers without decoding.
"""

from __future__ import annotations

import numpy as np


class Mp3Error(ValueError):
    """Malformed or unsupported MP3 stream (typed, never silent)."""


# ---------------------------------------------------------------------------
# MSB-first bit reader (layer III main data and side info are big-endian
# bit-packed, unlike Vorbis' LSB-first packing)
# ---------------------------------------------------------------------------


class BitReaderMSB:
    """MSB-first sliding-window reader; O(bits read) per call."""

    __slots__ = ("_data", "_nbits", "pos", "_win", "_winbits", "_bytepos")

    def __init__(self, data: bytes):
        self._data = data
        self._nbits = 8 * len(data)
        self.pos = 0
        self._win = 0  # holds bits [pos, pos + _winbits), MSB-aligned low
        self._winbits = 0
        self._bytepos = 0

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self._nbits:
            raise Mp3Error("bitstream exhausted")
        win, winbits, bytepos = self._win, self._winbits, self._bytepos
        while winbits < n:
            win = (win << 8) | self._data[bytepos]
            bytepos += 1
            winbits += 8
        keep = winbits - n
        out = win >> keep
        self._win = win & ((1 << keep) - 1)
        self._winbits = keep
        self._bytepos = bytepos
        self.pos = pos + n
        return out

    def read_bit(self) -> int:
        return self.read(1)

    def peek(self, n: int) -> int:
        """Next n bits without consuming; past-the-end bits read as 0
        (callers bound consumption with part2_3_length separately)."""
        win, winbits, bytepos = self._win, self._winbits, self._bytepos
        data = self._data
        while winbits < n and bytepos < len(data):
            win = (win << 8) | data[bytepos]
            bytepos += 1
            winbits += 8
        self._win, self._winbits, self._bytepos = win, winbits, bytepos
        if winbits >= n:
            return win >> (winbits - n)
        return win << (n - winbits)

    def skip(self, n: int) -> None:
        pos = self.pos
        if pos + n > self._nbits:
            raise Mp3Error("bitstream exhausted")
        # window always holds >= n bits here after a peek(n) at the same
        # position; fall back to read() otherwise
        if self._winbits >= n:
            self._winbits -= n
            self._win &= (1 << self._winbits) - 1
            self.pos = pos + n
        else:
            self.read(n)


# ---------------------------------------------------------------------------
# Header / layout tables (MPEG-1 layer III)
# ---------------------------------------------------------------------------

# kbit/s by bitrate_index (index 0 = free format, 15 = reserved)
BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112,
            128, 160, 192, 224, 256, 320]
SAMPLE_RATES = {0: 44100, 1: 48000, 2: 32000}

# scalefactor band boundaries, MPEG-1 long (23 entries) / short (14)
SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}

# §2.4.3.4 preemphasis table (21 long bands)
PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]

# scalefac_compress -> (slen1, slen2)
SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]

# ---------------------------------------------------------------------------
# Huffman registry (ISO Table B.7 data; see module docstring for the
# transcription contract).  Each big-value table: (linbits,
# {(length, code): (x, y)}).  Decode is bit-at-a-time like ext/vorbis.
# ---------------------------------------------------------------------------


def _tbl(pairs):
    """pairs: iterable of (x, y, hlen, hcod) -> lookup dict."""
    out = {}
    for x, y, hlen, hcod in pairs:
        out[(hlen, hcod)] = (x, y)
    return out


def _tbl_mat(hlen, hcod):
    """hlen/hcod matrices (spec layout: row x, column y) -> lookup
    dict, VALIDATED as a complete prefix code at import: every ISO
    B.7 big-value table is a Huffman code (pairwise prefix-free,
    Kraft sum exactly 1), and an n*n-entry table passing that gate by
    chance is implausible — the transcription contract is that tables
    are admitted only when their first honest transcription validates
    (iterating a recalled table against this check until it closes
    would manufacture a plausible-but-WRONG code, worse than the
    typed wall; tables 10/11/13/15/16/24 failed first-transcription
    validation and stay out)."""
    from fractions import Fraction

    n = len(hlen)
    codes: dict = {}
    for x in range(n):
        for y in range(n):
            ln, c = hlen[x][y], hcod[x][y]
            if not (0 < ln <= 19 and 0 <= c < (1 << ln)) or \
                    (ln, c) in codes:
                raise AssertionError(
                    f"B.7 transcription corrupt at ({x},{y})")
            codes[(ln, c)] = (x, y)
    if sum(Fraction(1, 2 ** ln) for (ln, _) in codes) != 1:
        raise AssertionError("B.7 transcription fails Kraft equality")
    items = sorted(codes)
    for i, (l1, c1) in enumerate(items):
        for (l2, c2) in items[i + 1:]:
            if l1 <= l2 and (c2 >> (l2 - l1)) == c1:
                raise AssertionError(
                    "B.7 transcription not prefix-free")
    return codes


# table 1: 2x2 values
_T1 = _tbl([
    (0, 0, 1, 0b1),
    (0, 1, 3, 0b001),
    (1, 0, 2, 0b01),
    (1, 1, 3, 0b000),
])
# table 2: 3x3 values
_T2 = _tbl([
    (0, 0, 1, 0b1),
    (0, 1, 3, 0b010),
    (0, 2, 6, 0b000001),
    (1, 0, 3, 0b011),
    (1, 1, 3, 0b001),
    (1, 2, 5, 0b00001),
    (2, 0, 5, 0b00011),
    (2, 1, 5, 0b00010),
    (2, 2, 6, 0b000000),
])
# table 3: 3x3 values
_T3 = _tbl([
    (0, 0, 2, 0b11),
    (0, 1, 2, 0b10),
    (0, 2, 6, 0b000001),
    (1, 0, 3, 0b001),
    (1, 1, 2, 0b01),
    (1, 2, 5, 0b00001),
    (2, 0, 5, 0b00011),
    (2, 1, 5, 0b00010),
    (2, 2, 6, 0b000000),
])

# tables 5-9 and 12 (r12 data entry; 4x4 / 6x6 / 8x8 value tables,
# linbits 0) — admitted through _tbl_mat's complete-prefix-code gate
_T5 = _tbl_mat([[1, 3, 6, 7], [3, 3, 6, 7], [6, 6, 7, 8], [7, 6, 7, 8]],
               [[1, 2, 6, 5], [3, 1, 4, 4], [7, 5, 7, 1], [6, 1, 1, 0]])
_T6 = _tbl_mat([[3, 3, 5, 7], [3, 2, 4, 5], [4, 4, 5, 6], [6, 5, 6, 7]],
               [[7, 3, 5, 1], [6, 2, 3, 2], [5, 4, 4, 1], [3, 3, 2, 0]])
_T7 = _tbl_mat(
    [[1, 3, 6, 8, 8, 9], [3, 4, 6, 7, 7, 8], [6, 5, 7, 8, 8, 9],
     [7, 7, 8, 9, 9, 9], [7, 7, 8, 9, 9, 10], [8, 8, 9, 10, 10, 10]],
    [[1, 2, 10, 19, 16, 10], [3, 3, 7, 10, 5, 3], [11, 4, 13, 17, 8, 4],
     [12, 11, 18, 15, 11, 2], [7, 6, 9, 14, 3, 1], [6, 4, 5, 3, 2, 0]])
_T8 = _tbl_mat(
    [[2, 3, 6, 8, 8, 9], [3, 2, 4, 8, 8, 8], [6, 4, 6, 8, 8, 9],
     [8, 8, 8, 9, 9, 10], [8, 7, 8, 9, 10, 10], [9, 8, 9, 9, 11, 11]],
    [[3, 4, 6, 18, 12, 5], [5, 1, 2, 16, 9, 3], [7, 3, 5, 14, 7, 3],
     [19, 17, 15, 13, 10, 4], [13, 5, 8, 11, 5, 1], [12, 4, 4, 1, 1, 0]])
_T9 = _tbl_mat(
    [[3, 3, 5, 6, 8, 9], [3, 3, 4, 5, 6, 8], [4, 4, 5, 6, 7, 8],
     [6, 5, 6, 7, 7, 8], [7, 6, 7, 7, 8, 9], [8, 7, 8, 8, 9, 9]],
    [[7, 5, 9, 14, 15, 7], [6, 4, 5, 5, 6, 7], [7, 6, 8, 8, 8, 5],
     [15, 6, 9, 10, 5, 1], [11, 7, 9, 6, 4, 1], [14, 4, 6, 2, 6, 0]])
_T12 = _tbl_mat(
    [[4, 3, 5, 7, 8, 9, 9, 9], [3, 3, 4, 5, 7, 7, 8, 8],
     [5, 4, 5, 6, 7, 8, 7, 8], [6, 5, 6, 6, 7, 8, 8, 8],
     [7, 6, 7, 7, 8, 8, 8, 9], [8, 7, 8, 8, 8, 9, 8, 9],
     [8, 7, 7, 8, 8, 9, 9, 10], [9, 8, 8, 9, 9, 9, 9, 10]],
    [[9, 6, 16, 33, 41, 39, 38, 26], [7, 5, 6, 9, 23, 16, 26, 11],
     [17, 7, 11, 14, 21, 30, 10, 7], [17, 10, 15, 12, 18, 28, 14, 5],
     [32, 13, 22, 19, 18, 16, 9, 5], [40, 17, 31, 29, 17, 13, 4, 2],
     [27, 12, 11, 15, 10, 7, 4, 1], [27, 12, 8, 12, 6, 3, 1, 0]])

BIG_VALUE_TABLES: dict[int, tuple[int, dict]] = {
    0: (0, {}),  # table 0: no bits, all zero
    1: (0, _T1),
    2: (0, _T2),
    3: (0, _T3),
    5: (0, _T5),
    6: (0, _T6),
    7: (0, _T7),
    8: (0, _T8),
    9: (0, _T9),
    12: (0, _T12),
}

# Outstanding B.7 data entry, per the transcription contract (tables
# admitted only when the FIRST honest transcription passes the
# structural gate; 4 and 14 are "not used" by the spec):
#   10, 11 — 8x8, linbits 0       13, 15 — 16x16, linbits 0
#   16, 24 — 16x16 ESC base matrices
# ESC tables 16-31 are SIXTEEN selectors over those TWO base
# matrices: 17-23 reuse table 16's codes, 25-31 reuse table 24's,
# differing only in linbits (the spec's ESC list below — structural
# data, not a Huffman transcription).  The alias registration makes
# every ESC selector light up the moment its base matrix lands, so
# the outstanding entry is six matrices for sixteen selectors.
ESC_LINBITS: dict[int, int] = {
    16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
    24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13,
}


def _register_esc_aliases(registry: dict) -> None:
    """Fill ESC selectors 17-23 / 25-31 from their base matrices (16 /
    24) when present — separated from import so tests can drive the
    wiring against an injected base without a real transcription."""
    for sel, lb in ESC_LINBITS.items():
        base = 16 if sel < 24 else 24
        if base in registry and sel not in registry:
            registry[sel] = (lb, registry[base][1])


_register_esc_aliases(BIG_VALUE_TABLES)

# count1 table B (count1table_select=1): every quadruple is its 4-bit
# one's complement, length 4
_C1B = {
    (4, (~v) & 0xF): ((v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1)
    for v in range(16)
}


def _tbl_quad(entries):
    """count1 entries ((v, hlen, hcod) with v the packed vwxy nibble)
    -> lookup dict, VALIDATED as a complete prefix code over exactly
    the 16 quadruples at import (the `_tbl_mat` gate for the quad
    shape — admitted only when the first honest transcription
    closes)."""
    from fractions import Fraction

    codes: dict = {}
    seen_v: set = set()
    for v, ln, c in entries:
        if not (0 <= v < 16) or v in seen_v or \
                not (0 < ln <= 19 and 0 <= c < (1 << ln)) or \
                (ln, c) in codes:
            raise AssertionError(
                f"B.7 count1 transcription corrupt at v={v:04b}")
        seen_v.add(v)
        codes[(ln, c)] = ((v >> 3) & 1, (v >> 2) & 1,
                          (v >> 1) & 1, v & 1)
    if len(codes) != 16:
        raise AssertionError("B.7 count1 transcription incomplete")
    if sum(Fraction(1, 2 ** ln) for (ln, _) in codes) != 1:
        raise AssertionError(
            "B.7 count1 transcription fails Kraft equality")
    items = sorted(codes)
    for i, (l1, c1) in enumerate(items):
        for (l2, c2) in items[i + 1:]:
            if l1 <= l2 and (c2 >> (l2 - l1)) == c1:
                raise AssertionError(
                    "B.7 count1 transcription not prefix-free")
    return codes


# count1 table A (count1table_select=0 — the COMMON case in real
# encoders; r14 data entry): first honest transcription passed the
# structural gate unmodified.  The hlen column carries its own
# redundancy — weight(vwxy)∈{0,1,2,3,4} → {1,4,5,6,6} bits, with
# 0101 the single weight-2 outlier at 6 bits — and the code SET is
# the three consecutive blocks {0100..0111}/{00011..00111}/
# {000000..000101}, both structures matching the published table.
_C1A = _tbl_quad([
    (0b0000, 1, 0b1),
    (0b0001, 4, 0b0101),
    (0b0010, 4, 0b0100),
    (0b0011, 5, 0b00101),
    (0b0100, 4, 0b0110),
    (0b0101, 6, 0b000101),
    (0b0110, 5, 0b00100),
    (0b0111, 6, 0b000100),
    (0b1000, 4, 0b0111),
    (0b1001, 5, 0b00011),
    (0b1010, 5, 0b00110),
    (0b1011, 6, 0b000000),
    (0b1100, 5, 0b00111),
    (0b1101, 6, 0b000010),
    (0b1110, 6, 0b000011),
    (0b1111, 6, 0b000001),
])
COUNT1_TABLES: dict[int, dict] = {0: _C1A, 1: _C1B}


def _huff_decode(br: BitReaderMSB, table: dict, max_len: int = 19):
    code = 0
    for length in range(1, max_len + 1):
        code = (code << 1) | br.read_bit()
        hit = table.get((length, code))
        if hit is not None:
            return hit
    raise Mp3Error("invalid Huffman code")


def _compile_lut(table: dict) -> tuple[int, list]:
    """(max_len, flat) where flat[peeked max_len bits] = (*values, hlen)
    or None for invalid prefixes — one peek+skip per codeword instead of
    bit-at-a-time dict probes (the decode hot path)."""
    max_len = max(length for length, _ in table)
    flat: list = [None] * (1 << max_len)
    for (length, code), values in table.items():
        base = code << (max_len - length)
        for fill in range(1 << (max_len - length)):
            flat[base | fill] = (*values, length)
    return max_len, flat


# compiled peek LUTs (the dict registries above stay the public,
# test-facing transcription ground truth)
_BV_LUT = {
    sel: (linbits, _compile_lut(tab) if tab else None)
    for sel, (linbits, tab) in BIG_VALUE_TABLES.items()
}
_C1_LUT = {sel: _compile_lut(tab) for sel, tab in COUNT1_TABLES.items()}


# ---------------------------------------------------------------------------
# frame / side-info parsing
# ---------------------------------------------------------------------------


class FrameHeader:
    __slots__ = ("bitrate", "rate", "padding", "mode", "mode_ext",
                 "protection", "frame_size", "channels")

    def __init__(self, b: bytes, off: int):
        if b[off] != 0xFF or (b[off + 1] & 0xE0) != 0xE0:
            raise Mp3Error(f"lost frame sync at {off}")
        version = (b[off + 1] >> 3) & 0x3
        layer = (b[off + 1] >> 1) & 0x3
        if version != 0b11:
            raise Mp3Error("only MPEG-1 audio is supported")
        if layer != 0b01:
            raise Mp3Error("only layer III is supported")
        self.protection = not (b[off + 1] & 1)
        bi = (b[off + 2] >> 4) & 0xF
        si = (b[off + 2] >> 2) & 0x3
        if bi == 0:
            raise Mp3Error("free-format bitrate not supported")
        if bi == 15 or si == 3:
            raise Mp3Error("reserved bitrate/sample-rate index")
        self.bitrate = BITRATES[bi] * 1000
        self.rate = SAMPLE_RATES[si]
        self.padding = (b[off + 2] >> 1) & 1
        self.mode = (b[off + 3] >> 6) & 0x3  # 0 stereo 1 joint 2 dual 3 mono
        self.mode_ext = (b[off + 3] >> 4) & 0x3
        self.channels = 1 if self.mode == 3 else 2
        self.frame_size = 144 * self.bitrate // self.rate + self.padding


class GranuleInfo:
    __slots__ = ("part2_3_length", "big_values", "global_gain",
                 "scalefac_compress", "window_switching", "block_type",
                 "mixed_block_flag", "table_select", "subblock_gain",
                 "region0_count", "region1_count", "preflag",
                 "scalefac_scale", "count1table_select")


def _parse_side_info(br: BitReaderMSB, channels: int):
    main_data_begin = br.read(9)
    br.read(5 if channels == 1 else 3)  # private bits
    scfsi = [[br.read_bit() for _ in range(4)] for _ in range(channels)]
    granules = []
    for _gr in range(2):
        chs = []
        for _ch in range(channels):
            g = GranuleInfo()
            g.part2_3_length = br.read(12)
            g.big_values = br.read(9)
            if g.big_values > 288:
                raise Mp3Error(f"big_values {g.big_values} > 288")
            g.global_gain = br.read(8)
            g.scalefac_compress = br.read(4)
            g.window_switching = br.read_bit()
            if g.window_switching:
                g.block_type = br.read(2)
                if g.block_type == 0:
                    raise Mp3Error(
                        "window_switching with block_type 0 is forbidden"
                    )
                g.mixed_block_flag = br.read_bit()
                g.table_select = [br.read(5), br.read(5), 0]
                g.subblock_gain = [br.read(3) for _ in range(3)]
                # §2.4.2.7 implicit values under window switching
                g.region0_count = 8 if g.block_type == 2 \
                    and not g.mixed_block_flag else 7
                g.region1_count = 20 - g.region0_count
            else:
                g.block_type = 0
                g.mixed_block_flag = 0
                g.table_select = [br.read(5), br.read(5), br.read(5)]
                g.subblock_gain = [0, 0, 0]
                g.region0_count = br.read(4)
                g.region1_count = br.read(3)
            g.preflag = br.read_bit()
            g.scalefac_scale = br.read_bit()
            g.count1table_select = br.read_bit()
            chs.append(g)
        granules.append(chs)
    return main_data_begin, scfsi, granules


# ---------------------------------------------------------------------------
# main-data decode stages
# ---------------------------------------------------------------------------


def _read_scalefactors(br: BitReaderMSB, g: GranuleInfo, scfsi, prev):
    """Returns (long_sf[21], short_sf[3][13]) — unused layout zero."""
    slen1, slen2 = SLEN[g.scalefac_compress]
    long_sf = [0] * 22
    short_sf = [[0] * 13 for _ in range(3)]
    if g.block_type == 2 and g.window_switching:
        if g.mixed_block_flag:
            for sfb in range(8):
                long_sf[sfb] = br.read(slen1) if slen1 else 0
            for sfb in range(3, 6):
                for w in range(3):
                    short_sf[w][sfb] = br.read(slen1) if slen1 else 0
            for sfb in range(6, 12):
                for w in range(3):
                    short_sf[w][sfb] = br.read(slen2) if slen2 else 0
        else:
            for sfb in range(6):
                for w in range(3):
                    short_sf[w][sfb] = br.read(slen1) if slen1 else 0
            for sfb in range(6, 12):
                for w in range(3):
                    short_sf[w][sfb] = br.read(slen2) if slen2 else 0
    else:
        # scfsi groups (granule 1 may reuse granule 0's values)
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2)]
        for gi, (lo, hi, slen) in enumerate(groups):
            if scfsi[gi] and prev is not None:
                for sfb in range(lo, hi):
                    long_sf[sfb] = prev[sfb]
            else:
                for sfb in range(lo, hi):
                    long_sf[sfb] = br.read(slen) if slen else 0
    return long_sf, short_sf


def _huffman_spectrum(br: BitReaderMSB, g: GranuleInfo, rate: int,
                      part2_start: int) -> np.ndarray:
    """576 requantizer inputs (signed ints) for one granule-channel."""
    xs = np.zeros(576, dtype=np.float64)
    sfb_l = SFB_LONG[rate]
    if g.window_switching and g.block_type == 2:
        region1_start = 36
        region2_start = 576
    else:
        region1_start = sfb_l[min(g.region0_count + 1, 22)]
        region2_start = sfb_l[
            min(g.region0_count + 1 + g.region1_count + 1, 22)
        ]

    def lut_for(region_start: int):
        if region_start < region1_start:
            sel = g.table_select[0]
        elif region_start < region2_start:
            sel = g.table_select[1]
        else:
            sel = g.table_select[2]
        got = _BV_LUT.get(sel)
        if got is None:
            base = (16 if 16 <= sel < 24 else
                    24 if 24 <= sel < 32 else sel)
            raise Mp3Error(
                f"Huffman table {sel} not in the registry — "
                f"transcribing ISO Table B.7 matrix {base} into "
                "BIG_VALUE_TABLES extends it"
                + (f" (and its ESC aliases {base}..{base + 7} with it)"
                   if base in (16, 24) else "")
            )
        return got

    end = part2_start + g.part2_3_length
    i = 0
    bv_end = g.big_values * 2
    if bv_end > 576:
        raise Mp3Error("big_values region overruns 576 lines")
    while i < bv_end:
        # decode one region with a fixed table (the region LUT swap out
        # of the pair loop is the decode hot path)
        seg_end = min(
            bv_end,
            region1_start if i < region1_start
            else (region2_start if i < region2_start else 576),
        )
        linbits, tab = lut_for(i)
        if not tab:
            i = seg_end if seg_end > i else i + 2
            continue
        max_len, flat = tab
        while i < seg_end:
            hit = flat[br.peek(max_len)]
            if hit is None:
                raise Mp3Error("invalid Huffman code")
            x, y, hlen = hit
            br.skip(hlen)
            if x == 15 and linbits:
                x += br.read(linbits)
            if x:
                if br.read_bit():
                    x = -x
            if y == 15 and linbits:
                y += br.read(linbits)
            if y:
                if br.read_bit():
                    y = -y
            xs[i] = x
            xs[i + 1] = y
            i += 2
    # count1 region: quadruples until part2_3_length is exhausted
    c1 = _C1_LUT.get(g.count1table_select)
    while br.pos < end and i + 3 < 576:
        if c1 is None:
            raise Mp3Error(
                "count1 Huffman table A not in the registry (transcribe "
                "ISO Table B.7 into COUNT1_TABLES[0] to extend)"
            )
        max_len, flat = c1
        hit = flat[br.peek(max_len)]
        if hit is None:
            raise Mp3Error("invalid Huffman code")
        *quad, hlen = hit
        if br.pos + hlen > end:
            break  # partial quad straddles the granule boundary:
            # discard it (the ISO reference decoder's rule) — the peeked
            # bits belong to the next granule
        br.skip(hlen)
        vals = []
        for v in quad:
            if v:
                if br.pos >= end:
                    vals = None  # sign bits straddle: discard the quad
                    break
                if br.read_bit():
                    v = -v
            vals.append(v)
        if vals is None:
            break
        for v in vals:
            xs[i] = v
            i += 1
    if br.pos > end:
        raise Mp3Error("granule overran part2_3_length")
    # skip stuffing up to the granule boundary
    while br.pos < end:
        br.read_bit()
    return xs


def _requantize(xs: np.ndarray, g: GranuleInfo, long_sf, short_sf,
                rate: int) -> np.ndarray:
    out = np.sign(xs) * np.abs(xs) ** (4.0 / 3.0)
    mult = 1.0 if g.scalefac_scale else 0.5
    base = 2.0 ** (0.25 * (g.global_gain - 210))
    if g.window_switching and g.block_type == 2 and not g.mixed_block_flag:
        bands = SFB_SHORT[rate]
        gains = np.ones(576)
        for sfb in range(13):  # band 12 (the remainder) has sf == 0
            width = bands[sfb + 1] - bands[sfb]
            for w in range(3):
                lo = bands[sfb] * 3 + width * w
                gains[lo:lo + width] = base * 2.0 ** (
                    -2.0 * g.subblock_gain[w] - mult * short_sf[w][sfb]
                )
        return out * gains
    if g.window_switching and g.block_type == 2 and g.mixed_block_flag:
        # mixed: lines 0..35 are long scalefactor bands 0..7 (every
        # MPEG-1 rate has SFB_LONG[8] == 36), lines 36.. are short
        # bands 3..12 (SFB_SHORT[3] == 12, 12*3 == 36)
        gains = np.ones(576)
        lbands = SFB_LONG[rate]
        for sfb in range(8):
            sf = long_sf[sfb] + (PRETAB[sfb] if g.preflag else 0)
            gains[lbands[sfb]:lbands[sfb + 1]] = base * 2.0 ** (-mult * sf)
        sbands = SFB_SHORT[rate]
        for sfb in range(3, 13):
            width = sbands[sfb + 1] - sbands[sfb]
            for w in range(3):
                lo = sbands[sfb] * 3 + width * w
                gains[lo:lo + width] = base * 2.0 ** (
                    -2.0 * g.subblock_gain[w] - mult * short_sf[w][sfb]
                )
        return out * gains
    bands = SFB_LONG[rate]
    gains = np.ones(576)
    for sfb in range(21):
        sf = long_sf[sfb] + (PRETAB[sfb] if g.preflag else 0)
        gains[bands[sfb]:bands[sfb + 1]] = base * 2.0 ** (-mult * sf)
    gains[bands[21]:] = base
    return out * gains


def _reorder_short(xr: np.ndarray, rate: int,
                   mixed: bool = False) -> np.ndarray:
    """§2.4.3.4: short-block lines arrive per (sfb, window); the hybrid
    filterbank wants per (window-slot) interleave inside each band.
    Mixed blocks keep lines 0..35 (the long part) in place."""
    bands = SFB_SHORT[rate]
    out = xr.copy()
    for sfb in range(3 if mixed else 0, 13):
        width = bands[sfb + 1] - bands[sfb]
        start = bands[sfb] * 3
        block = xr[start:start + 3 * width]
        if len(block) < 3 * width:
            break
        re = np.empty_like(block)
        for w in range(3):
            re[w::3] = block[w * width:(w + 1) * width]
        out[start:start + 3 * width] = re
    return out


# §2.4.3.5 alias-reduction butterflies (ci are spec constants)
_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
                -0.0037])
_CS = 1.0 / np.sqrt(1.0 + _CI**2)
_CA = _CI / np.sqrt(1.0 + _CI**2)


_ALIAS_UP = (np.arange(1, 32) * 18)[:, None] - 1 - np.arange(8)[None, :]
_ALIAS_DN = (np.arange(1, 32) * 18)[:, None] + np.arange(8)[None, :]


def _alias_reduce(xr: np.ndarray, boundaries: int = 31) -> np.ndarray:
    # butterflies of different subband boundaries touch disjoint lines
    # (i <= 7 < 9), so all boundaries vectorize per coefficient; mixed
    # blocks pass boundaries=1 (only the long lower two subbands)
    out = xr.copy()
    up = _ALIAS_UP[:boundaries]
    dn = _ALIAS_DN[:boundaries]
    a = out[up].copy()
    b = out[dn].copy()
    out[up] = a * _CS[None, :] - b * _CA[None, :]
    out[dn] = b * _CS[None, :] + a * _CA[None, :]
    return out


_imdct_cache: dict[int, np.ndarray] = {}


def _imdct_mat(n: int) -> np.ndarray:
    mat = _imdct_cache.get(n)
    if mat is None:
        j = np.arange(n).reshape(-1, 1)
        k = np.arange(n // 2).reshape(1, -1)
        mat = np.cos(np.pi / (2 * n) * (2 * j + 1 + n // 2) * (2 * k + 1))
        _imdct_cache[n] = mat
    return mat


_win_cache: dict[int, np.ndarray] = {}


def _block_window(block_type: int) -> np.ndarray:
    w = _win_cache.get(block_type)
    if w is not None:
        return w
    i = np.arange(36)
    if block_type == 0:
        w = np.sin(np.pi / 36 * (i + 0.5))
    elif block_type == 1:  # start
        w = np.sin(np.pi / 36 * (i + 0.5))
        w[18:24] = 1.0
        w[24:30] = np.sin(np.pi / 12 * (np.arange(6) + 6.5))
        w[30:] = 0.0
    elif block_type == 3:  # end
        w = np.sin(np.pi / 36 * (i + 0.5))
        w[:6] = 0.0
        w[6:12] = np.sin(np.pi / 12 * (np.arange(6) + 0.5))
        w[12:18] = 1.0
    else:
        raise Mp3Error(f"bad block type {block_type}")
    _win_cache[block_type] = w
    return w


_SHORT_WIN = np.sin(np.pi / 12 * (np.arange(12) + 0.5))


def _imdct_granule(xr: np.ndarray, g: GranuleInfo,
                   overlap: np.ndarray) -> np.ndarray:
    """18 time samples × 32 subbands for one granule; updates overlap."""
    short = g.window_switching and g.block_type == 2
    if not short:
        # all 32 subbands share the block window: ONE (36,18)@(18,32)
        # matmul instead of a Python loop (the decode hot path)
        spec = xr.reshape(32, 18).T
        out = (_imdct_mat(36) @ spec) * _block_window(g.block_type)[:, None]
        ts = out[:18].T + overlap
        overlap[:] = out[18:].T
        ts[1::2, 1::2] = -ts[1::2, 1::2]  # frequency inversion
        return ts
    ts = np.zeros((32, 18))
    for sb in range(32):
        spec = xr[sb * 18:(sb + 1) * 18]
        if not (g.mixed_block_flag and sb < 2):
            out = np.zeros(36)
            m = _imdct_mat(12)
            for w in range(3):
                y = (m @ spec[w::3]) * _SHORT_WIN
                out[6 + 6 * w:6 + 6 * w + 12] += y
        else:
            out = (_imdct_mat(36) @ spec) * _block_window(0)
        ts[sb] = out[:18] + overlap[sb]
        overlap[sb] = out[18:]
        if sb % 2 == 1:  # frequency inversion (odd subbands, odd slots)
            ts[sb][1::2] = -ts[sb][1::2]
    return ts


# ---------------------------------------------------------------------------
# polyphase synthesis (§2.4.3.7 modulation; documented analytic prototype)
# ---------------------------------------------------------------------------

_SYNTH_G: np.ndarray | None = None


def _synth_tensor() -> np.ndarray:
    """G[m, s, j] = g_s[32 m + j]: synthesis filters g_s[n] =
    p[n] · cos((2s+1)(n − 16) · pi/64) — the spec's modulation with the
    analytic low-pass prototype p (Blackman-windowed sinc, cutoff pi/64,
    512 taps, unit passband gain).  See the module docstring for the
    D-table deviation contract."""
    global _SYNTH_G
    if _SYNTH_G is not None:
        return _SYNTH_G
    n = np.arange(512)
    x = (n - 255.5) / 32.0
    p = np.sinc(x / 2.0)  # cutoff pi/64: sinc(n/64) family
    p *= np.blackman(512)
    p /= p.sum()  # unit DC (passband) gain of the prototype
    g = 2.0 * p[None, :] * np.cos(
        (2 * np.arange(32)[:, None] + 1) * (n[None, :] - 16) * np.pi / 64
    )
    _SYNTH_G = np.transpose(g.reshape(32, 16, 32), (1, 0, 2)).copy()
    return _SYNTH_G


class _Synthesizer:
    """32-subband → PCM: 16-slot polyphase history, vectorized as one
    sliding-window einsum per granule (per-slot loops were the decode
    hot path; the window view carries the history dependence)."""

    def __init__(self):
        self.tail = np.zeros((15, 32))  # previous 15 slots, oldest first
        # G2[(s, m), j] — one BLAS matmul per granule instead of einsum
        self._g2 = np.ascontiguousarray(
            np.transpose(_synth_tensor(), (1, 0, 2)).reshape(512, 32)
        )

    def run(self, ts: np.ndarray) -> np.ndarray:
        """ts: (32 subbands, n_slots) → (n_slots*32,) PCM."""
        seq = np.concatenate([self.tail, ts.T], axis=0)  # (15+n, 32)
        win = np.lib.stride_tricks.sliding_window_view(seq, 16, axis=0)
        # win[t, s, i] = seq[t+i, s]; polyphase age m = 15 - i
        w = np.ascontiguousarray(win[:, :, ::-1]).reshape(win.shape[0], 512)
        out = w @ self._g2
        self.tail = seq[-15:].copy()
        return out.reshape(-1)


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------

MAX_FRAMES = 1 << 20  # ~6 h of audio; adversarial-stream backstop


def decode_mp3(content: bytes) -> tuple[np.ndarray, int]:
    """MP3 bytes → (float64 mono samples, sample_rate).

    Typed :class:`Mp3Error` on malformed/unsupported streams — never an
    anonymous exception and never a hang (every loop is bounded by the
    frame walk).  Stereo is downmixed to mono after MS decoding, matching
    :func:`tulflow_spark.ext.media_codecs.decode_audio`'s contract.
    """
    try:
        return _decode_mp3(content)
    except Mp3Error:
        raise
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            OverflowError) as exc:
        raise Mp3Error(f"malformed stream: {exc!r}") from exc


def _skip_id3(b: bytes) -> int:
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
        | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
    return 10 + size


def _decode_mp3(content: bytes) -> tuple[np.ndarray, int]:
    pos = _skip_id3(content)
    if pos >= len(content):
        raise Mp3Error("no audio frames after ID3 tag")
    reservoir = b""
    rate = None
    channels = None
    overlap = None
    synth = None
    pcm_parts: list[np.ndarray] = []
    frames = 0
    while pos + 4 <= len(content):
        try:
            hdr = FrameHeader(content, pos)
        except Mp3Error:
            if frames:
                # trailing non-frame bytes after a decoded stream (ID3v1
                # 'TAG' trailer, APE tags, padding): end cleanly at the
                # last good frame instead of discarding decoded audio
                break
            raise
        if rate is None:
            rate, channels = hdr.rate, hdr.channels
            overlap = [np.zeros((32, 18)) for _ in range(channels)]
            synth = [_Synthesizer() for _ in range(channels)]
        elif hdr.rate != rate or hdr.channels != channels:
            # trailer bytes can parse as a sync-valid header with other
            # parameters (0xFF padding, tag data); after at least one
            # decoded frame, stop at the last good frame instead of
            # discarding the stream (same rule as the sync-loss break)
            break
        frames += 1
        if frames > MAX_FRAMES:
            raise Mp3Error("frame count exceeds MAX_FRAMES")
        if pos + hdr.frame_size > len(content):
            break  # truncated final frame: stop cleanly
        off = pos + 4
        if hdr.protection:
            off += 2  # CRC-16 present; parsed past, not verified
        side_len = 17 if channels == 1 else 32
        sbr = BitReaderMSB(content[off:off + side_len])
        main_begin, scfsi, granules = _parse_side_info(sbr, channels)
        main_bytes = content[off + side_len:pos + hdr.frame_size]
        if main_begin > len(reservoir):
            # decoder startup / cut stream: spec says skip this frame's
            # audio (its main data lives in frames we never saw)
            reservoir = (reservoir + main_bytes)[-511:]
            pos += hdr.frame_size
            continue
        data = (reservoir[len(reservoir) - main_begin:] if main_begin
                else b"") + main_bytes
        br = BitReaderMSB(data)
        prev_sf: list = [None] * channels  # granule-0 values for scfsi
        for gr in range(2):
            ts_ch = []
            xr_ch = []
            for ch in range(channels):
                g = granules[gr][ch]
                part2_start = br.pos
                long_sf, short_sf = _read_scalefactors(
                    br, g,
                    scfsi[ch] if gr == 1 else [0, 0, 0, 0],
                    prev_sf[ch] if gr == 1 else None,
                )
                if gr == 0:
                    prev_sf[ch] = long_sf
                xs = _huffman_spectrum(br, g, rate, part2_start)
                xr_ch.append(_requantize(xs, g, long_sf, short_sf, rate))
            if channels == 2:
                if hdr.mode == 1 and (hdr.mode_ext & 0x1):
                    raise Mp3Error("intensity stereo not supported")
                if hdr.mode == 1 and (hdr.mode_ext & 0x2):
                    mid, side = xr_ch
                    s2 = np.sqrt(2.0)
                    xr_ch = [(mid + side) / s2, (mid - side) / s2]
            for ch in range(channels):
                g = granules[gr][ch]
                xr = xr_ch[ch]
                if g.window_switching and g.block_type == 2:
                    xr = _reorder_short(xr, rate,
                                        mixed=bool(g.mixed_block_flag))
                    if g.mixed_block_flag:
                        xr = _alias_reduce(xr, boundaries=1)
                else:
                    xr = _alias_reduce(xr)
                ts = _imdct_granule(xr, g, overlap[ch])
                ts_ch.append(synth[ch].run(ts))
            mixed = ts_ch[0] if channels == 1 else \
                0.5 * (ts_ch[0] + ts_ch[1])
            pcm_parts.append(mixed)
        reservoir = (reservoir + main_bytes)[-511:]
        pos += hdr.frame_size
    if not pcm_parts:
        raise Mp3Error("no decodable MP3 frames")
    # decode_audio's contract is samples in [-1, 1]; an over-unity
    # global_gain can push the synthesis output past it (conformant
    # decoders clamp at the 16-bit output stage)
    return np.clip(np.concatenate(pcm_parts), -1.0, 1.0), rate


# ---------------------------------------------------------------------------
# fixture encoder (the ext/vorbis.py `encode_test_tone` strategy: tests
# and driver-gated pairs get streams whose decoded signal is analytic in
# the input parameters; every bit below follows the field layout above)
# ---------------------------------------------------------------------------


class _BW:
    def __init__(self):
        self.bits: list[int] = []

    def w(self, v: int, n: int) -> None:  # MSB-first
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


def _granule_main_bits(line_k: int, global_gain: int,
                       table_select: int = 1) -> _BW:
    """Scalefactors (zero bits at scalefac_compress=0) + Huffman:
    ``table_select`` pairs, all (0,0) except the pair containing
    ``line_k`` (positive)."""
    _, tab = BIG_VALUE_TABLES[table_select]
    by_xy = {xy: lc for lc, xy in tab.items()}
    w = _BW()
    n_pairs = line_k // 2 + 1
    for p in range(n_pairs):
        if p == line_k // 2:
            ln, c = by_xy[(1, 0)] if line_k % 2 == 0 else by_xy[(0, 1)]
            w.w(c, ln)
            w.w(0, 1)          # sign +
        else:
            ln, c = by_xy[(0, 0)]
            w.w(c, ln)
    return w


def encode_test_tone_mp3(line_k: int, n_frames: int,
                         global_gain: int = 210,
                         reservoir_bytes: int = 0,
                         mixed_block: bool = False,
                         table_select: int = 1,
                         count1_quads: list | None = None,
                         count1table_select: int = 1) -> bytes:
    """Minimal legal MPEG-1 Layer III mono stream (48 kHz, 32 kbit/s —
    exactly 96-byte frames), every granule carrying a single positive
    spectral line at ``line_k`` with amplitude 2^((global_gain-210)/4).
    Decodes to a steady tone near (line_k + 0.5) · rate / 1152 Hz.

    ``reservoir_bytes`` > 0 exercises the bit reservoir: each frame's
    main data starts that many bytes back inside the previous frame
    (main_data_begin set accordingly).  ``mixed_block`` writes
    window-switching granules (block_type 2, mixed_block_flag 1) whose
    tone line must sit in the long lower-two-subband region
    (line_k < 36).  ``count1_quads`` appends count1-region quadruples
    (signed ints in {-1, 0, 1}, four lines each) after the big-values
    region, encoded under ``count1table_select`` (0 = table A,
    1 = table B)."""
    if not 0 <= line_k < 576:
        raise ValueError("line_k must be in [0, 576)")
    if mixed_block and line_k >= 36:
        raise ValueError("mixed_block fixtures need line_k < 36")
    if n_frames < 1:
        raise ValueError("need at least one frame")
    if not BIG_VALUE_TABLES.get(table_select, (0, None))[1]:
        raise ValueError(
            f"table {table_select} not in the transcribed registry")
    if count1table_select not in COUNT1_TABLES:
        raise ValueError(
            f"count1 table {count1table_select} not in the registry")
    gbits = _granule_main_bits(line_k, global_gain, table_select)
    by_quad = {qv: lc for lc, qv in
               COUNT1_TABLES[count1table_select].items()}
    for quad in count1_quads or []:
        if len(quad) != 4 or any(abs(int(q)) > 1 for q in quad):
            raise ValueError(
                f"count1 quadruple must be four of -1/0/1: {quad!r}")
        ln, c = by_quad[tuple(1 if q else 0 for q in quad)]
        gbits.w(c, ln)
        for q in quad:
            if q:
                gbits.w(1 if q < 0 else 0, 1)   # sign bit
    header = bytes([0xFF, 0xFB, 0x14, 0xC0])
    p23 = len(gbits.bits)
    main = _BW()
    main.bits = gbits.bits + gbits.bits  # two granules
    main_bytes = main.bytes()
    space = 96 - 4 - 17
    if len(main_bytes) + reservoir_bytes > space:
        raise ValueError("main data does not fit the 32 kbit/s frame")

    def side_info(main_data_begin: int) -> bytes:
        s = _BW()
        s.w(main_data_begin, 9)
        s.w(0, 5)              # private
        s.w(0, 4)              # scfsi
        for _gr in range(2):
            s.w(p23, 12)       # part2_3_length (scalefac bits are 0)
            s.w(line_k // 2 + 1, 9)   # big_values
            s.w(global_gain, 8)
            s.w(0, 4)          # scalefac_compress
            if mixed_block:
                s.w(1, 1)      # window_switching
                s.w(2, 2)      # block_type: short
                s.w(1, 1)      # mixed_block_flag
                s.w(table_select, 5)
                s.w(table_select, 5)  # table_select x2
                for _ in range(3):
                    s.w(0, 3)  # subblock_gain
            else:
                s.w(0, 1)      # window_switching
                for _ in range(3):
                    s.w(table_select, 5)  # same table everywhere
                s.w(7, 4)      # region0_count
                s.w(7, 3)      # region1_count
            s.w(0, 1)          # preflag
            s.w(0, 1)          # scalefac_scale
            s.w(count1table_select, 1)
        return s.bytes()

    # place main data: frame i's data begins `begin` bytes before its
    # own payload area (inside frame i-1's tail) when reservoir is on
    rb = min(reservoir_bytes, len(main_bytes))
    out = bytearray()
    payloads = [bytearray(space) for _ in range(n_frames)]
    for i in range(n_frames):
        begin = rb if i > 0 else 0
        data = main_bytes
        if begin:
            payloads[i - 1][space - begin:] = data[:begin]
            payloads[i][:len(data) - begin] = data[begin:]
        else:
            payloads[i][:len(data)] = data
    for i in range(n_frames):
        begin = rb if i > 0 else 0
        out += header + side_info(begin) + payloads[i]
    return bytes(out)


__all__ = [
    "Mp3Error",
    "BitReaderMSB",
    "decode_mp3",
    "encode_test_tone_mp3",
    "BIG_VALUE_TABLES",
    "COUNT1_TABLES",
]
