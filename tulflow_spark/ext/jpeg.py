"""Baseline JPEG decoder — stdlib + numpy only.

Closes the r4 "compressed media decode" gap for the most common photo
format without Pillow: marker parse (DQT/SOF0/DHT/DRI/SOS), MSB-first
Huffman entropy decode with byte-unstuffing and restart markers, zigzag +
dequantize, separable 8×8 IDCT as two numpy matmuls, chroma upsampling by
replication, JFIF full-range YCbCr→RGB.

Scope: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2 —
spectral selection + successive approximation, DC/AC first and
refinement scans, EOB runs, interleaved DC and non-interleaved AC block
orders, restart markers), 8-bit, 1 or 3 components, any h/v sampling
factors ≤ 2.  Arithmetic coding, hierarchical/lossless SOFs, 12-bit,
and CMYK raise :class:`UnsupportedJpeg` naming the feature — the same
typed-wall policy as the other codecs in
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
    unstuffing; restart markers reset via :meth:`sync_restart`.

    ``strict=True`` (the baseline single-scan mode) raises on a non-RST,
    non-EOI marker inside scan data — corrupt input stays a typed error.
    Progressive scans pass ``strict=False``: their entropy segment is
    legitimately followed by the next scan's DHT/SOS, which must read as
    end-of-data padding, not an error."""

    __slots__ = ("data", "pos", "acc", "nbits", "strict")

    def __init__(self, data: bytes, pos: int, strict: bool = True):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.strict = strict

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
                elif (
                    0xD0 <= nxt <= 0xD7
                    or nxt == 0xD9
                    or nxt == 0xFF  # fill byte before a marker (B.1.1.2)
                    or not self.strict
                ):
                    # end of this scan's entropy data (RSTn/EOI — or, in
                    # a progressive stream, the next scan's DHT/SOS):
                    # stop filling real bits and pad
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
    prog_state = None
    restart_interval = 0
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise UnsupportedJpeg(f"marker expected at {pos}")
        if content[pos + 1] == 0xFF:
            pos += 1  # fill byte before a marker (T.81 B.1.1.2)
            continue
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
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
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(
                f"SOF{marker - 0xC0} JPEG not supported "
                "(baseline and progressive DCT only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise UnsupportedJpeg("SOS before SOF")
            ns = seg[0]
            if not frame.get("progressive"):
                scan_sel = {}
                for i in range(ns):
                    cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                    scan_sel[cs] = (tt >> 4, tt & 0x0F)
                return _decode_scan(
                    content, pos + 2 + seglen, frame, scan_sel, qtables,
                    huff_dc, huff_ac, restart_interval,
                )
            if prog_state is None:
                prog_state = _prog_alloc(frame)
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(
                    (
                        j for j, c in enumerate(frame["comps"])
                        if c["id"] == cs
                    ),
                    None,
                )
                if ci is None:
                    raise UnsupportedJpeg(
                        f"SOS references undeclared component id {cs}"
                    )
                scan_comps.append((ci, tt >> 4, tt & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            pos = _progressive_scan(
                content, pos + 2 + seglen, frame, prog_state, scan_comps,
                ss, se, ahal >> 4, ahal & 0x0F, huff_dc, huff_ac,
                restart_interval,
            )
            continue
        pos += 2 + seglen
    if frame is not None and frame.get("progressive") and prog_state:
        return _prog_finalize(frame, prog_state, qtables)
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
    reader = _BitReader(content, pos)  # strict: baseline single scan
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


# --- progressive DCT (SOF2) --------------------------------------------------


def _prog_alloc(frame):
    """Per-component zigzag coefficient planes over the MCU-padded block
    grid, plus DC predictors and the AC EOB-run counter."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if hmax > 2 or vmax > 2:
        raise UnsupportedJpeg("sampling factors > 2 not supported")
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    coef = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
        for c in frame["comps"]
    ]
    return {
        "coef": coef,
        "hmax": hmax,
        "vmax": vmax,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
    }


def _entropy_end(content: bytes, pos: int) -> int:
    """First position of a real marker (not stuffing, not RSTn) at or
    after ``pos`` — the end of one scan's entropy-coded segment."""
    p = pos
    n = len(content)
    while p + 1 < n:
        if content[p] == 0xFF:
            nxt = content[p + 1]
            if nxt == 0xFF:
                p += 1  # fill byte (T.81 B.1.1.2): marker code follows
            elif nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return p
            else:
                p += 2
        else:
            p += 1
    return n


def _progressive_scan(content, pos, frame, state, scan_comps, ss, se,
                      ah, al, huff_dc, huff_ac, restart_interval):
    """Decode ONE progressive scan into the coefficient planes.  Returns
    the stream position of the next marker.

    Block order per T.81: a multi-component scan must be a DC scan
    (Ss=0) and walks the MCU-interleaved grid; a single-component scan
    walks the component's OWN block grid (no MCU padding).  EOB runs
    (G.2.2) span blocks within AC scans; restart intervals reset DC
    predictors, the EOB run, and the bit reader."""
    comps = frame["comps"]
    coef = state["coef"]
    reader = _BitReader(content, pos, strict=False)
    pred = [0] * len(comps)
    eob = [0]  # boxed EOB-run counter shared across blocks

    def dc_block(ci, td, by, bx):
        c = coef[ci][by, bx]
        if ah == 0:
            t = reader.decode(huff_dc[td])
            diff = _extend(reader.read_bits(t), t) if t else 0
            pred[ci] += diff
            c[0] = pred[ci] << al
        else:
            if reader.read_bit():
                c[0] |= 1 << al

    def ac_first(ci, ta, by, bx):
        c = coef[ci][by, bx]
        if eob[0] > 0:
            eob[0] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode(huff_ac[ta])
            r, s1 = rs >> 4, rs & 0x0F
            if s1 == 0:
                if r == 15:
                    k += 16
                    continue
                eob[0] = (1 << r) - 1 + (reader.read_bits(r) if r else 0)
                break
            k += r
            if k > se:
                raise UnsupportedJpeg("AC index overflow in scan")
            c[k] = _extend(reader.read_bits(s1), s1) << al
            k += 1

    def ac_refine(ci, ta, by, bx):
        # T.81 G.1.2.3 correction-bit procedure (independently written to
        # the spec; structure necessarily parallels any conformant
        # decoder): every NONZERO history coefficient visited takes one
        # refinement bit; zero-history coefficients are skipped by the
        # run length and the (run, size=1) symbol plants a new +-1<<Al.
        c = coef[ci][by, bx]
        p1 = 1 << al
        m1 = -p1
        k = ss
        if eob[0] == 0:
            while k <= se:
                rs = reader.decode(huff_ac[ta])
                r, s1 = rs >> 4, rs & 0x0F
                newval = 0
                if s1 == 0:
                    if r < 15:
                        eob[0] = (1 << r) + (
                            reader.read_bits(r) if r else 0
                        )
                        break
                    # ZRL: pass 16 zero-history coefficients
                else:
                    if s1 != 1:
                        raise UnsupportedJpeg(
                            "refinement scan symbol with size != 1"
                        )
                    newval = p1 if reader.read_bit() else m1
                while k <= se:
                    if c[k] != 0:
                        if reader.read_bit():
                            if (int(c[k]) & p1) == 0:
                                c[k] += p1 if c[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    c[k] = newval
                k += 1
        if eob[0] > 0:
            while k <= se:
                if c[k] != 0:
                    if reader.read_bit():
                        if (int(c[k]) & p1) == 0:
                            c[k] += p1 if c[k] > 0 else m1
                k += 1
            eob[0] -= 1

    def do_restart():
        reader.sync_restart()
        pred[:] = [0] * len(comps)
        eob[0] = 0

    if len(scan_comps) > 1:
        if ss != 0:
            raise UnsupportedJpeg("multi-component AC scan is invalid")
        unit = 0
        for my in range(state["mcus_y"]):
            for mx in range(state["mcus_x"]):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    do_restart()
                unit += 1
                for ci, td, _ta in scan_comps:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_block(
                                ci, td,
                                my * c["v"] + by, mx * c["h"] + bx,
                            )
    else:
        ci, td, ta = scan_comps[0]
        c = comps[ci]
        # non-interleaved: the component's own ceil(dim/8) block grid
        cw = -(-frame["w"] * c["h"] // state["hmax"])
        ch = -(-frame["h"] * c["v"] // state["vmax"])
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    do_restart()
                unit += 1
                if ss == 0:
                    dc_block(ci, td, by, bx)
                elif ah == 0:
                    ac_first(ci, ta, by, bx)
                else:
                    ac_refine(ci, ta, by, bx)
    # the entropy segment contains no real markers (only stuffing and
    # RSTn), so scanning from the segment start finds its true end
    # regardless of the reader's lookahead state
    return _entropy_end(content, pos)


def _prog_finalize(frame, state, qtables):
    """All scans consumed: dequantize + IDCT every block and assemble
    exactly like the baseline path."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = state["hmax"], state["vmax"]
    planes = []
    zz = ZIGZAG
    for ci, c in enumerate(comps):
        grid = state["coef"][ci]
        bh, bw = grid.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), np.float64)
        q = qtables[c["tq"]]
        for by in range(bh):
            for bx in range(bw):
                block = np.zeros(64, np.float64)
                block[zz] = grid[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct2(
                    block.reshape(8, 8)
                )
        planes.append(plane)
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
