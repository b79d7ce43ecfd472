"""Baseline JPEG decoder — stdlib + numpy only.

Closes the r4 "compressed media decode" gap for the most common photo
format without Pillow: marker parse (DQT/SOF0/DHT/DRI/SOS), MSB-first
Huffman entropy decode with byte-unstuffing and restart markers, zigzag +
dequantize, separable 8×8 IDCT as two numpy matmuls, chroma upsampling by
replication, JFIF full-range YCbCr→RGB.

Scope: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components, any
h/v sampling factors ≤ 2.  Progressive (SOF2), arithmetic coding,
12-bit, and CMYK raise :class:`UnsupportedJpeg` naming the feature — the
same typed-wall policy as the other codecs in
:mod:`tulflow_spark.ext.media_codecs`.

Like the PNG/GIF decoders this runs per-document inside Arrow-batched
``mapInPandas`` stages: the per-image Python loop is executor-side and
bounded by one image; the heavy math (IDCT, color transform) is numpy.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedJpeg(ValueError):
    """Recognized JPEG variant outside the baseline-decoder surface."""


ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal 8-point DCT-II basis; IDCT(X) = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    px = _C.T @ block @ _C
    # Snap to the half-integer grid when within float-noise distance: the
    # exact IDCT of integer (coeff × quant) inputs can land exactly on x.5
    # (e.g. a DC-only block), where an ulp of basis-matrix error would flip
    # the final round() by a full level vs exact arithmetic.
    snapped = np.round(px * 2.0) / 2.0
    return np.where(np.abs(px - snapped) < 1e-8, snapped, px)


class _HuffTable:
    """Canonical JPEG Huffman table → {(length, code): symbol}."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                self.max_len = length
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; restart markers reset via :meth:`sync_restart`."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1-bits past the end (spec behavior at EOI)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # restart/EOI marker: stop filling real bits
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    raise UnsupportedJpeg(
                        f"unexpected marker 0xFF{nxt:02X} in scan data"
                    )
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        length = 0
        code = 0
        while length <= table.max_len:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise UnsupportedJpeg("invalid Huffman code in scan data")

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker; reset bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise UnsupportedJpeg("missing restart marker")


def _extend(v: int, t: int) -> int:
    """DC/AC value extension (spec F.2.2.1): t-bit magnitude to signed."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array: (H, W, 3) RGB or (H, W) gray."""
    if content[:2] != b"\xff\xd8":
        raise UnsupportedJpeg("bad JPEG signature (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise UnsupportedJpeg(f"marker expected at {pos}")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        seg = content[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    q = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                qtables[tid] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                syms = seg[p + 17 : p + 17 + n]
                (huff_dc if cls == 0 else huff_ac)[tid] = _HuffTable(
                    counts, syms
                )
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise UnsupportedJpeg(f"{precision}-bit JPEG not supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise UnsupportedJpeg(
                    f"{ncomp}-component JPEG (CMYK?) not supported"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise UnsupportedJpeg(f"{kind} JPEG not supported (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise UnsupportedJpeg("SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_sel[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                content, pos + 2 + seglen, frame, scan_sel, qtables,
                huff_dc, huff_ac, restart_interval,
            )
        pos += 2 + seglen
    raise UnsupportedJpeg("no scan data (SOS) found")


def _decode_scan(content, pos, frame, scan_sel, qtables, huff_dc, huff_ac,
                 restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise UnsupportedJpeg("sampling factors > 2 not supported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64)
        )
    reader = _BitReader(content, pos)
    pred = [0] * len(comps)
    zz = ZIGZAG
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_sel[c["id"]]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, np.int32)
                        t = reader.decode(huff_dc[dc_t])
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(huff_ac[ac_t])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise UnsupportedJpeg("AC index overflow")
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[zz] = coeffs * q
                        px = _idct2(block.reshape(8, 8))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.stack([r, g, b], axis=-1).round(), 0, 255
    ).astype(np.uint8)
