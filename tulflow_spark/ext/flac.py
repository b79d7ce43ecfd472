"""Stdlib+numpy FLAC decoder + minimal encoder — extends the real-codec
surface (``ext/vorbis.py``, ``ext/mp3.py``) to the lossless format real
speech corpora ship in (LibriSpeech et al. are FLAC).

Scope (the public FLAC format: RFC 9639 / xiph.org spec; section numbers
below cite RFC 9639):

- stream walk: ``fLaC`` magic, metadata blocks (§8.1), STREAMINFO
  (§8.2: block sizes, sample rate, channels, bits-per-sample, total
  samples, MD5 of the unencoded audio),
- frame headers (§9.1): 14-bit sync, blocking strategy, coded
  block-size / sample-rate / channel-assignment / sample-size fields,
  UTF-8-style coded frame/sample number, CRC-8 (poly 0x07) verified,
- subframes (§9.2): CONSTANT, VERBATIM, FIXED orders 0-4, LPC to order
  32 (precision-coded coefficients, right-shift), wasted-bits unary,
- residuals (§9.2.7): 4-/5-bit Rice partitions with escape-to-raw
  partitions, zigzag mapping,
- stereo decorrelation (§9.1.3): independent, left/side, right/side,
  mid/side,
- integrity: frame CRC-16 (poly 0x8005) verified per frame; the
  STREAMINFO MD5 of the full unencoded signal verified when present,
- decode is exact integer reconstruction (FLAC is lossless); the public
  :func:`decode_flac` downmixes to mono float in [-1, 1] matching
  :func:`tulflow_spark.ext.media_codecs.decode_audio`'s contract.

Adversarial-bytes discipline (the ext/vorbis.py fuzz lessons): every
loop is bounded by header-declared, range-checked sizes; reads past the
end raise typed :class:`FlacError`; after >= 1 verified frame a sync
loss is a clean stop (trailing bytes tolerance, same rule as
``ext/mp3.py``), on frame 0 it is a typed error.

The encoder half (:func:`encode_flac`) exists to make driver-gated
oracle pairs possible without shipping binary fixtures: it emits
spec-conformant mono streams using VERBATIM or FIXED(+Rice) subframes —
enough to exercise the decoder's real arithmetic paths — and computes
the STREAMINFO MD5, so decoded == encoded is verified end to end.
Independent bit-writers in ``tests/test_flac.py`` pin the decoder
against hand-derived bitstreams (incl. stereo modes and LPC), not
against this encoder.

Reference analog: none (the reference pipeline has no media columns);
this is north-star multimodal surface beside mm8/mm10.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacError(ValueError):
    """Malformed, truncated, or unsupported-in-spec FLAC bytes (typed)."""


# ---------------------------------------------------------------------------
# CRCs (RFC 9639 §9.1.8 / §9.3: CRC-8 poly 0x07 init 0; CRC-16 poly
# 0x8005 init 0, both bitwise big-endian)
# ---------------------------------------------------------------------------


def _make_crc8_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        table.append(crc)
    return table


def _make_crc16_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
        table.append(crc)
    return table


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16[(crc >> 8) ^ b] ^ ((crc << 8) & 0xFFFF)
    return crc


# ---------------------------------------------------------------------------
# MSB-first bit reader (FLAC packs MSB-first, like MP3, unlike Vorbis)
# ---------------------------------------------------------------------------


class _Bits:
    """MSB-first sliding-window reader with typed exhaustion."""

    __slots__ = ("data", "nbits", "pos", "_win", "_winbits", "_bytepos")

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.nbits = 8 * len(data)
        self.pos = 8 * start_byte
        self._win = 0
        self._winbits = 0
        self._bytepos = start_byte

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise FlacError("bitstream exhausted")
        win, winbits, bytepos = self._win, self._winbits, self._bytepos
        data = self.data
        while winbits < n:
            win = (win << 8) | data[bytepos]
            bytepos += 1
            winbits += 8
        keep = winbits - n
        out = win >> keep
        self._win = win & ((1 << keep) - 1)
        self._winbits = keep
        self._bytepos = bytepos
        self.pos = pos + n
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Zero bits before the terminating 1 (bounded by stream end)."""
        n = 0
        while True:
            if self.read(1):
                return n
            n += 1

    def align(self) -> None:
        rem = self.pos & 7
        if rem:
            self.read(8 - rem)

    def bytepos(self) -> int:
        """Byte offset of the next unread bit (only valid when aligned)."""
        return self.pos >> 3

    def seek(self, p: int) -> None:
        """Reposition to absolute bit ``p`` (used after a numpy fast
        path consumed a region)."""
        if p > self.nbits:
            raise FlacError("bitstream exhausted")
        self.pos = p
        byte, rem = p >> 3, p & 7
        if rem:
            self._win = self.data[byte] & ((1 << (8 - rem)) - 1)
            self._winbits = 8 - rem
            self._bytepos = byte + 1
        else:
            self._win = 0
            self._winbits = 0
            self._bytepos = byte


class _NpBits:
    """Bit plane of one frame region as numpy arrays — the vectorized
    hot path for Rice residuals and fixed-width sample runs (the same
    move as ext/mp3.py's compiled LUTs: per-sample Python falls to a
    handful of indexed reads).  ``base`` is the absolute bit offset of
    the region's first bit; all public methods take/return ABSOLUTE bit
    positions so the :class:`_Bits` reader can be re-synced with
    ``seek``."""

    __slots__ = ("base", "bits", "cum", "ones", "n")

    def __init__(self, content: bytes, start_byte: int, end_byte: int):
        self.base = start_byte * 8
        arr = np.frombuffer(content, np.uint8, count=end_byte - start_byte,
                            offset=start_byte)
        self.bits = np.unpackbits(arr)
        self.n = len(self.bits)
        self.cum = None   # ones-before cumulative (built lazily)
        self.ones = None  # positions of 1 bits (built lazily)

    def _index(self) -> None:
        if self.ones is None:
            self.ones = np.nonzero(self.bits)[0]
            self.cum = np.cumsum(self.bits)

    def read_fixed(self, pos: int, count: int, width: int) -> tuple:
        """``count`` signed ``width``-bit values at absolute bit ``pos``
        → (int64 array, new absolute position)."""
        rel = pos - self.base
        end = rel + count * width
        if end > self.n:
            raise FlacError("bitstream exhausted")
        if count == 0 or width == 0:
            return np.zeros(count, np.int64), pos
        mat = self.bits[rel:end].reshape(count, width).astype(np.int64)
        pow2 = np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64)
        out = mat @ pow2
        out -= (out >> (width - 1)) << width  # sign extend
        return out, self.base + end

    def read_rice(self, pos: int, count: int, k: int) -> tuple:
        """``count`` Rice(k)+zigzag codes at absolute bit ``pos`` →
        (int64 array, new absolute position).  The sequential scan is a
        pointer walk over the precomputed ones/cumsum index (two indexed
        reads per code); quotients and remainders then vectorize."""
        if count == 0:
            return np.zeros(0, np.int64), pos
        self._index()
        rel = pos - self.base
        if rel < 0 or rel > self.n:
            raise FlacError("bitstream exhausted")
        ones, cum = self.ones, self.cum
        term = np.empty(count, np.int64)
        j = cum[rel - 1] if rel else 0
        p = rel
        try:
            for i in range(count):
                t = ones[j]
                term[i] = t
                p = t + 1 + k
                j = cum[p - 1] if p <= self.n else self._oob()
        except IndexError:
            raise FlacError("bitstream exhausted") from None
        if p > self.n:
            raise FlacError("bitstream exhausted")
        starts = np.empty(count, np.int64)
        starts[0] = rel
        if count > 1:
            starts[1:] = term[:-1] + 1 + k
        q = term - starts
        if k:
            idx = term[:, None] + np.arange(1, k + 1, dtype=np.int64)
            rem = self.bits[idx].astype(np.int64) @ (
                np.int64(1) << np.arange(k - 1, -1, -1, dtype=np.int64)
            )
            v = (q << k) | rem
        else:
            v = q
        return (v >> 1) ^ -(v & 1), self.base + p

    @staticmethod
    def _oob():
        raise IndexError


# ---------------------------------------------------------------------------
# STREAMINFO / metadata walk
# ---------------------------------------------------------------------------


def flac_tags(content: bytes) -> dict[str, str]:
    """VORBIS_COMMENT tags (metadata block type 4, §8.6: LE-length
    vendor string, LE count, ``KEY=value`` UTF-8 comments) → dict with
    upper-cased keys, first value wins.  ``{}`` when the stream carries
    no comment block; malformed blocks raise typed."""
    if content[:4] != b"fLaC":
        raise FlacError("not a FLAC stream (no fLaC magic)")
    pos = 4
    last = False
    while not last:
        if pos + 4 > len(content):
            raise FlacError("truncated metadata block header")
        hdr = content[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = pos + 4
        if body + length > len(content):
            raise FlacError("metadata block extends past end of stream")
        if btype == 4:
            blk = content[body : body + length]
            try:
                vlen = int.from_bytes(blk[:4], "little")
                at = 4 + vlen
                count = int.from_bytes(blk[at : at + 4], "little")
                at += 4
                tags: dict[str, str] = {}
                for _ in range(count):
                    clen = int.from_bytes(blk[at : at + 4], "little")
                    at += 4
                    if at + clen > len(blk):
                        raise ValueError("comment past block end")
                    comment = blk[at : at + clen].decode("utf-8")
                    at += clen
                    key, _, val = comment.partition("=")
                    tags.setdefault(key.upper(), val)
                return tags
            except (ValueError, UnicodeDecodeError) as exc:
                raise FlacError(
                    f"malformed VORBIS_COMMENT block: {exc!r}"
                ) from None
        pos = body + length
    return {}


class StreamInfo:
    __slots__ = ("min_block", "max_block", "sample_rate", "channels",
                 "bits_per_sample", "total_samples", "md5", "audio_start")

    def __init__(self, min_block, max_block, sample_rate, channels,
                 bits_per_sample, total_samples, md5, audio_start):
        self.min_block = min_block
        self.max_block = max_block
        self.sample_rate = sample_rate
        self.channels = channels
        self.bits_per_sample = bits_per_sample
        self.total_samples = total_samples
        self.md5 = md5
        self.audio_start = audio_start


def parse_flac_header(content: bytes) -> StreamInfo:
    """Magic + metadata-block walk → :class:`StreamInfo` (§8.1/§8.2).
    Header-only — never touches frame payloads, so it is probe-safe."""
    if content[:4] != b"fLaC":
        raise FlacError("not a FLAC stream (no fLaC magic)")
    pos = 4
    info = None
    last = False
    first = True
    while not last:
        if pos + 4 > len(content):
            raise FlacError("truncated metadata block header")
        hdr = content[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = pos + 4
        if body + length > len(content):
            raise FlacError("metadata block extends past end of stream")
        if first and btype != 0:
            raise FlacError("first metadata block must be STREAMINFO")
        if btype == 0:
            if length != 34:
                raise FlacError(f"STREAMINFO must be 34 bytes, got {length}")
            b = _Bits(content[body : body + 34])
            min_block = b.read(16)
            max_block = b.read(16)
            b.read(24)  # min frame size (0 = unknown)
            b.read(24)  # max frame size
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            md5 = content[body + 18 : body + 34]
            if rate == 0:
                raise FlacError("STREAMINFO sample rate 0 is invalid")
            info = StreamInfo(min_block, max_block, rate, channels, bps,
                              total, md5, 0)
        if btype == 127:
            raise FlacError("metadata block type 127 is forbidden")
        pos = body + length
        first = False
    if info is None:
        raise FlacError("no STREAMINFO block")
    info.audio_start = pos
    return info


# ---------------------------------------------------------------------------
# frame decode
# ---------------------------------------------------------------------------

# §9.1.1: coded block sizes (index 6/7 mean 8-/16-bit value follows)
_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
# §9.1.2: coded sample rates (12/13/14 mean a value follows; 0 = STREAMINFO)
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
# §9.1.4: coded sample sizes (0 = STREAMINFO)
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# §9.2.5 fixed-predictor coefficients by order (for the encoder; the
# decoder reconstructs via iterated cumulative sums)
_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_coded_number(bits: _Bits) -> int:
    """UTF-8-style coded frame/sample number (§9.1.5): 1-7 bytes."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise FlacError("malformed coded frame number")
    val = b0 & (0x3F >> n)
    for _ in range(n):
        cont = bits.read(8)
        if cont & 0xC0 != 0x80:
            raise FlacError("malformed coded frame number continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


def _rice_slow(bits: _Bits, count: int, param: int) -> np.ndarray:
    """Per-sample Rice decode — the exact fallback when the frame's
    numpy window doesn't cover a pathological (very long unary) run."""
    out = np.empty(count, np.int64)
    for i in range(count):
        q = bits.read_unary()
        v = (q << param) | bits.read(param) if param else q
        out[i] = (v >> 1) ^ -(v & 1)  # zigzag
    return out


def _fixed_slow(bits: _Bits, count: int, width: int) -> np.ndarray:
    out = np.empty(count, np.int64)
    for i in range(count):
        out[i] = bits.read_signed(width)
    return out


def _read_rice_run(bits: _Bits, nb, count: int, param: int) -> np.ndarray:
    if nb is not None:
        p0 = bits.pos
        try:
            vals, newpos = nb.read_rice(p0, count, param)
            bits.seek(newpos)
            return vals
        except FlacError:
            bits.seek(p0)  # window miss: exact slow path decides
    return _rice_slow(bits, count, param)


def _read_fixed_run(bits: _Bits, nb, count: int, width: int) -> np.ndarray:
    if nb is not None:
        p0 = bits.pos
        try:
            vals, newpos = nb.read_fixed(p0, count, width)
            bits.seek(newpos)
            return vals
        except FlacError:
            bits.seek(p0)
    return _fixed_slow(bits, count, width)


def _decode_residual(bits: _Bits, block_size: int, order: int,
                     nb=None) -> np.ndarray:
    """Rice-partitioned residual (§9.2.7) → int64 array of
    block_size - order values."""
    method = bits.read(2)
    if method > 1:
        raise FlacError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise FlacError("block size not divisible by partition count")
    per = block_size >> porder
    if per < order:
        # first partition holds per - order samples; must be >= 0
        raise FlacError("residual partition smaller than predictor order")
    out = np.empty(block_size - order, np.int64)
    idx = 0
    for p in range(nparts):
        count = per - order if p == 0 else per
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out[idx : idx + count] = 0
            else:
                out[idx : idx + count] = _read_fixed_run(
                    bits, nb, count, raw
                )
        else:
            out[idx : idx + count] = _read_rice_run(
                bits, nb, count, param
            )
        idx += count
    return out


def _undiff(warmup: np.ndarray, resid: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-``order`` fixed predictor: warmup + Δ^order tail
    → samples, via iterated cumulative sums (vectorized, exact int64)."""
    if order == 0:
        return resid.copy()
    x = resid
    for k in range(order - 1, -1, -1):
        # last value of Δ^k over the warmup region seeds the integration
        seed = int(np.diff(warmup, k)[-1]) if k else int(warmup[-1])
        x = seed + np.cumsum(x)
    return np.concatenate([warmup, x])


def _decode_subframe(bits: _Bits, block_size: int, sbits: int,
                     nb=None) -> np.ndarray:
    """One subframe (§9.2) → int64 samples (wasted bits restored)."""
    if bits.read(1):
        raise FlacError("subframe header padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.read_unary() + 1
    eff = sbits - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = np.full(block_size, bits.read_signed(eff), np.int64)
    elif stype == 1:  # VERBATIM
        out = _read_fixed_run(bits, nb, block_size, eff)
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        if order > block_size:
            raise FlacError("fixed order exceeds block size")
        warmup = _fixed_slow(bits, order, eff)
        resid = _decode_residual(bits, block_size, order, nb)
        out = _undiff(warmup, resid, order)
    elif stype >= 32:  # LPC, order 1-32
        order = (stype & 0x1F) + 1
        if order > block_size:
            raise FlacError("LPC order exceeds block size")
        warmup = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise FlacError("LPC precision code 1111 is invalid")
        shift = bits.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift is invalid")
        coeffs = [bits.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(bits, block_size, order, nb)
        samples = list(warmup)
        for r in resid.tolist():
            acc = 0
            for j, c in enumerate(coeffs):
                acc += c * samples[-1 - j]
            samples.append((acc >> shift) + r)
        out = np.asarray(samples, np.int64)
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def _decode_frame(content: bytes, start: int, info: StreamInfo):
    """One frame at byte offset ``start`` → (channel arrays, next offset).
    Raises FlacError for anything malformed; CRC-8 and CRC-16 verified."""
    bits = _Bits(content, start)
    sync = bits.read(14)
    if sync != 0x3FFE:
        raise FlacError("lost frame sync")
    if bits.read(1):
        raise FlacError("frame header reserved bit set")
    bits.read(1)  # blocking strategy (affects number semantics only)
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    chan_code = bits.read(4)
    ss_code = bits.read(3)
    if bits.read(1):
        raise FlacError("frame header reserved bit set")
    _read_coded_number(bits)
    if bs_code == 0:
        raise FlacError("reserved block size code 0")
    elif bs_code == 6:
        block_size = bits.read(8) + 1
    elif bs_code == 7:
        block_size = bits.read(16) + 1
    else:
        block_size = _BLOCK_SIZES[bs_code]
    if sr_code == 0:
        rate = info.sample_rate
    elif sr_code == 12:
        rate = bits.read(8) * 1000
    elif sr_code == 13:
        rate = bits.read(16)
    elif sr_code == 14:
        rate = bits.read(16) * 10
    elif sr_code == 15:
        raise FlacError("invalid sample rate code 15")
    else:
        rate = _SAMPLE_RATES[sr_code]
    if rate != info.sample_rate:
        raise FlacError("frame sample rate differs from STREAMINFO")
    if ss_code == 0:
        sbits = info.bits_per_sample
    elif ss_code == 3:
        raise FlacError("reserved sample size code 3")
    else:
        sbits = _SAMPLE_SIZES[ss_code]
    if sbits != info.bits_per_sample:
        raise FlacError("frame sample size differs from STREAMINFO")
    bits.align()
    crc_pos = bits.bytepos()
    if crc8(content[start:crc_pos]) != bits.read(8):
        raise FlacError("frame header CRC-8 mismatch")
    if chan_code <= 7:
        nchan = chan_code + 1
        side = None
    elif chan_code <= 10:
        nchan = 2
        side = ("ls", "rs", "ms")[chan_code - 8]
    else:
        raise FlacError(f"reserved channel assignment {chan_code}")
    if nchan != info.channels:
        raise FlacError("frame channel count differs from STREAMINFO")
    # numpy window over this frame's plausible extent (worst legal
    # verbatim frame + headroom); a pathological unary run past the
    # window falls back to the exact per-sample reader
    win_end = min(
        len(content),
        bits.bytepos() + 64 + nchan * (block_size * (sbits + 18) // 8 + 128),
    )
    nb = _NpBits(content, start, win_end)
    chans = []
    for c in range(nchan):
        ch_bits = sbits
        # the SIDE channel carries one extra bit (§9.1.3)
        if side == "ls" and c == 1 or side == "rs" and c == 0 \
                or side == "ms" and c == 1:
            ch_bits += 1
        chans.append(_decode_subframe(bits, block_size, ch_bits, nb))
    bits.align()
    crc_pos = bits.bytepos()
    if crc_pos + 2 > len(content):
        raise FlacError("truncated frame CRC-16")
    stored = struct.unpack_from(">H", content, crc_pos)[0]
    if crc16(content[start:crc_pos]) != stored:
        raise FlacError("frame CRC-16 mismatch")
    if side == "ls":
        left, s = chans
        chans = [left, left - s]
    elif side == "rs":
        s, right = chans
        chans = [right + s, right]
    elif side == "ms":
        mid, s = chans
        lr_sum = (mid << 1) | (s & 1)
        left = (lr_sum + s) >> 1
        chans = [left, left - s]
    return chans, crc_pos + 2


def decode_flac(content: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (mono float32 samples in [-1, 1], sample_rate).

    Exact integer reconstruction, downmixed as the mean of channels and
    scaled by 2^(bps-1) — for mono 16-bit input the floats are exact
    dyadic rationals, so ``round(sample * 32768)`` recovers the encoded
    integers bit-for-bit (the property the mm11 oracle pair checks).
    STREAMINFO MD5 is verified when present and the stream is complete.
    """
    info = parse_flac_header(content)
    pos = info.audio_start
    per_chan: list[list[np.ndarray]] = [[] for _ in range(info.channels)]
    decoded = 0
    n_frames = 0
    while pos + 2 <= len(content) and (
        info.total_samples == 0 or decoded < info.total_samples
    ):
        try:
            chans, pos = _decode_frame(content, pos, info)
        except FlacError:
            if n_frames == 0:
                raise
            break  # trailing bytes after >= 1 verified frame: clean stop
        for c, arr in enumerate(chans):
            per_chan[c].append(arr)
        decoded += len(chans[0])
        n_frames += 1
    if n_frames == 0:
        raise FlacError("no audio frames found")
    if info.total_samples and decoded < info.total_samples:
        raise FlacError(
            f"stream truncated: {decoded} of {info.total_samples} samples"
        )
    chans = [np.concatenate(parts) for parts in per_chan]
    if info.total_samples:
        chans = [c[: info.total_samples] for c in chans]
    if info.md5 != b"\x00" * 16 and info.total_samples and \
            info.bits_per_sample % 8 == 0:
        width = info.bits_per_sample // 8
        inter = np.empty(len(chans[0]) * len(chans), np.int64)
        for c, arr in enumerate(chans):
            inter[c :: len(chans)] = arr
        raw = _pack_le(inter, width)
        if hashlib.md5(raw).digest() != info.md5:
            raise FlacError("decoded audio does not match STREAMINFO MD5")
    mono = np.mean(np.stack(chans), axis=0)
    scale = float(1 << (info.bits_per_sample - 1))
    return (mono / scale).astype(np.float32), info.sample_rate


def _pack_le(samples: np.ndarray, width: int) -> bytes:
    """Signed samples → little-endian ``width``-byte packing (the MD5
    input layout, §8.2)."""
    u = samples.astype(np.int64) & ((1 << (8 * width)) - 1)
    out = np.empty((len(samples), width), np.uint8)
    for b in range(width):
        out[:, b] = (u >> (8 * b)) & 0xFF
    return out.tobytes()


# ---------------------------------------------------------------------------
# minimal encoder (mono; VERBATIM or FIXED+Rice subframes) — fixture
# generator for the driver-gated oracle pair, spec-conformant output
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "_acc", "_nbits")

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, n: int) -> None:
        self._acc = (self._acc << n) | (value & ((1 << n) - 1))
        self._nbits += n
        while self._nbits >= 8:
            self._nbits -= 8
            self.buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bits(self, arr: np.ndarray) -> None:
        """Append a 0/1 uint8 array: bit-by-bit to the next byte
        boundary, then one packbits for the aligned bulk."""
        head = min(len(arr), (-self._nbits) % 8)
        for b in arr[:head]:
            self.write(int(b), 1)
        rest = arr[head:]
        cut = len(rest) - (len(rest) % 8)
        if cut:
            self.buf += np.packbits(rest[:cut]).tobytes()
        for b in rest[cut:]:
            self.write(int(b), 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bytes(self) -> bytes:
        assert self._nbits == 0
        return bytes(self.buf)


def _write_coded_number(w: _BitWriter, v: int) -> None:
    """UTF-8-style coded number (§9.1.5): n-byte form carries
    (7 - n) + 6(n - 1) payload bits for n in 2..6, 36 bits for n = 7."""
    if v < 0x80:
        w.write(v, 8)
        return
    for nbytes in range(2, 8):
        cap = (7 - nbytes) + 6 * (nbytes - 1) if nbytes < 7 else 36
        if v.bit_length() <= cap:
            break
    else:
        raise ValueError("coded number exceeds 36 bits")
    rest = nbytes - 1
    lead_payload = 7 - nbytes if nbytes < 7 else 0
    lead_prefix = (0xFF << (lead_payload + 1)) & 0xFF
    w.write(lead_prefix | (v >> (6 * rest)), 8)
    for i in range(rest - 1, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _fixed_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """Signed values → flat 0/1 array of ``width``-bit fields."""
    v = np.asarray(vals, np.int64) & ((1 << width) - 1)
    shifts = np.arange(width - 1, -1, -1, dtype=np.int64)
    return ((v[:, None] >> shifts) & 1).astype(np.uint8).ravel()


def _rice_bits(resid: np.ndarray, k: int) -> np.ndarray:
    """Zigzag + Rice(k) encode a residual vector → flat 0/1 array
    (vectorized: one scatter for the terminators, one for remainders)."""
    r = np.asarray(resid, np.int64)
    zz = (np.abs(r) << 1) - (r < 0)
    q = zz >> k
    lens = q + 1 + k
    ends = np.cumsum(lens)
    out = np.zeros(int(ends[-1]) if len(ends) else 0, np.uint8)
    term = ends - 1 - k  # terminator 1 of each code
    out[term] = 1
    if k:
        idx = term[:, None] + np.arange(1, k + 1, dtype=np.int64)
        shifts = np.arange(k - 1, -1, -1, dtype=np.int64)
        out[idx.ravel()] = ((zz[:, None] >> shifts) & 1).astype(
            np.uint8
        ).ravel()
    return out


def _best_rice_param(resid: np.ndarray) -> int:
    """Smallest-total-bits Rice parameter (exhaustive over 0..14)."""
    zz = (np.abs(2 * resid) - (resid < 0)).astype(np.int64)
    best_k, best_cost = 0, None
    for k in range(15):
        cost = int(np.sum(zz >> k)) + len(zz) * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def encode_flac(samples: np.ndarray, rate: int, block_size: int = 1024,
                fixed_order: int | None = 2) -> bytes:
    """16-bit FLAC encoder: one frame per ``block_size`` block,
    FIXED(``fixed_order``)+Rice subframes (``None`` → VERBATIM).
    ``samples`` is mono ``(n,)`` or stereo ``(n, 2)``; stereo frames use
    LEFT/SIDE decorrelation (channel assignment 8, the side subframe at
    17 bits).  Spec-conformant output (CRC-8/CRC-16/MD5 all real) —
    decodable by any FLAC reader; a successful in-repo decode verifies
    the STREAMINFO MD5, i.e. exact reconstruction of EVERY channel.
    """
    s = np.asarray(samples, np.int64)
    stereo = s.ndim == 2
    if s.ndim == 0 or s.ndim > 2 or (stereo and s.shape[1] != 2):
        raise ValueError("encode_flac takes (n,) mono or (n, 2) stereo")
    if np.any(s > 32767) or np.any(s < -32768):
        raise ValueError("samples exceed 16-bit range")
    if not 0 < rate < (1 << 20):
        raise ValueError("sample rate out of STREAMINFO range")
    if not 16 <= block_size <= 65535:
        # 16-bit header fields would silently truncate larger values
        # into a corrupt stream; 16 is the spec's minimum block size
        raise ValueError("block_size must be in [16, 65535]")
    if fixed_order is not None and not 0 <= fixed_order <= 4:
        raise ValueError("fixed predictor order must be 0-4")
    md5 = hashlib.md5(_pack_le(s.reshape(-1), 2)).digest()
    n = len(s)
    head = _BitWriter()
    head.write(0x80, 8)  # last-metadata-block flag | type 0 (STREAMINFO)
    head.write(34, 24)
    # STREAMINFO min/max block size exclude the (possibly short) last
    # block, so both are the nominal block size
    head.write(block_size, 16)
    head.write(block_size, 16)
    head.write(0, 24)  # min frame size unknown
    head.write(0, 24)
    head.write(rate, 20)
    head.write(1 if stereo else 0, 3)  # channels - 1
    head.write(15, 5)  # bits per sample - 1
    head.write(n, 36)
    out = bytearray(b"fLaC")
    out += head.bytes()
    out += md5
    for frame_idx, off in enumerate(range(0, n, block_size)):
        block = s[off : off + block_size]
        if stereo:
            left = block[:, 0]
            side = block[:, 0] - block[:, 1]  # L/S decorrelation (§9.1.3)
            subs = [(left, 16), (side, 17)]
            chan_code = 8
        else:
            subs = [(block, 16)]
            chan_code = 0
        out += _encode_frame(subs, chan_code, frame_idx, fixed_order)
    return bytes(out)


def _encode_frame(subs: list[tuple[np.ndarray, int]], chan_code: int,
                  frame_idx: int, fixed_order: int | None) -> bytes:
    block_size = len(subs[0][0])
    w = _BitWriter()
    w.write(0x3FFE, 14)       # sync
    w.write(0, 1)             # reserved
    w.write(0, 1)             # fixed-blocksize stream
    w.write(7, 4)             # block size: 16-bit value follows
    w.write(0, 4)             # sample rate: from STREAMINFO
    w.write(chan_code, 4)
    w.write(4, 3)             # 16-bit samples
    w.write(0, 1)             # reserved
    _write_coded_number(w, frame_idx)
    w.write(block_size - 1, 16)
    hdr = bytes(w.buf)
    w.write(crc8(hdr), 8)
    for block, width in subs:
        _encode_subframe(w, block, width, fixed_order)
    w.align()
    body = bytes(w.buf)
    return body + struct.pack(">H", crc16(body))


def _encode_subframe(w: "_BitWriter", block: np.ndarray, width: int,
                     fixed_order: int | None) -> None:
    order = fixed_order
    if order is not None and order > len(block) - 1:
        order = None  # block too short for warmup + 1 residual sample
    if order is None:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)  # no wasted bits
        w.write_bits(_fixed_bits(block, width))
    else:
        w.write(0, 1)
        w.write(8 + order, 6)  # FIXED
        w.write(0, 1)
        for v in block[:order].tolist():
            w.write(int(v) & ((1 << width) - 1), width)
        resid = block.copy()
        for _ in range(order):
            resid = np.diff(resid)
        w.write(0, 2)  # 4-bit Rice parameters
        w.write(0, 4)  # partition order 0
        k = _best_rice_param(resid)
        w.write(k, 4)
        w.write_bits(_rice_bits(resid, k))


__all__ = [
    "FlacError",
    "StreamInfo",
    "crc8",
    "crc16",
    "decode_flac",
    "encode_flac",
    "flac_tags",
    "parse_flac_header",
]
