"""Baseline JPEG decoder: golden DC-only fixtures assembled from the spec
(custom minimal Huffman tables, hand-derivable expected pixels) plus
roundtrips through an independent in-test encoder.  The encoder emits
DC-only blocks (AC quantized away), so its correctness is checkable by
hand: every decoded 8×8 block must equal round(DC/8 + 128)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tulflow_spark.ext.jpeg import UnsupportedJpeg, decode_jpeg


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def byte_align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(1)  # pad with 1-bits per spec

    def tobytes(self) -> bytes:
        self.byte_align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


# minimal tables: DC symbols 0..11 at length 4; AC has only EOB at length 1
DC_COUNTS = [0, 0, 0, 12] + [0] * 12
DC_SYMS = bytes(range(12))
AC_COUNTS = [1] + [0] * 15
AC_SYMS = bytes([0x00])


def _dc_code(sym: int) -> tuple[int, int]:
    return sym, 4  # canonical: symbol i gets code i at length 4


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht(cls: int, tid: int, counts, syms) -> bytes:
    return _seg(0xC4, bytes([cls << 4 | tid]) + bytes(counts) + syms)


def _encode_dc_only(planes: list[np.ndarray], sampling=None,
                    restart_interval: int = 0) -> bytes:
    """Encode component planes (each H×W, multiples of 8) as a baseline
    JPEG whose blocks carry ONLY the DC coefficient: decoded block value
    = round(DC/8) + 128.  Quant: q[0]=1 (AC entries irrelevant)."""
    ncomp = len(planes)
    h, w = planes[0].shape
    sampling = sampling or [(1, 1)] * ncomp
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, sh << 4 | sv, 0])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, DC_COUNTS, DC_SYMS)
    out += _dht(1, 0, AC_COUNTS, AC_SYMS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    writer = _BitWriter()
    pred = [0] * ncomp
    scan = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                scan += writer.tobytes()
                scan += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                writer = _BitWriter()
                pred = [0] * ncomp
            mcu_count += 1
            for ci, (sh, sv) in enumerate(sampling):
                plane = planes[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        dc = int(round(8 * (float(block.mean()) - 128.0)))
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        mag = abs(diff)
                        t = mag.bit_length()
                        code, ln = _dc_code(t)
                        writer.write(code, ln)
                        if t:
                            v = diff if diff >= 0 else diff + (1 << t) - 1
                            writer.write(v, t)
                        writer.write(0, 1)  # AC EOB (code 0, length 1)
    scan += writer.tobytes()
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def _expected_dc_only(plane: np.ndarray) -> np.ndarray:
    """What the decoder must produce for a DC-only encode of `plane`."""
    h, w = plane.shape
    out = np.empty_like(plane, dtype=np.uint8)
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            block = plane[y0 : y0 + 8, x0 : x0 + 8]
            dc = int(round(8 * (float(block.mean()) - 128.0)))
            out[y0 : y0 + 8, x0 : x0 + 8] = int(
                np.clip(round(dc / 8.0 + 128.0), 0, 255)
            )
    return out


def test_gray_constant_blocks_golden():
    # two blocks wide: block means 128 and 200 → decoded exactly those
    plane = np.zeros((8, 16), np.float64)
    plane[:, :8] = 128.0
    plane[:, 8:] = 200.0
    out = decode_jpeg(_encode_dc_only([plane]))
    assert out.shape == (8, 16)
    assert np.array_equal(out, _expected_dc_only(plane))
    assert out[0, 0] == 128 and out[0, 8] == 200


def test_gray_gradient_blocks():
    rng = np.random.default_rng(7)
    plane = rng.integers(0, 256, size=(24, 32)).astype(np.float64)
    out = decode_jpeg(_encode_dc_only([plane]))
    assert np.array_equal(out, _expected_dc_only(plane))


def test_color_444_roundtrip():
    rng = np.random.default_rng(11)
    y = rng.integers(30, 220, size=(16, 16)).astype(np.float64)
    cb = np.full((16, 16), 128.0)
    cr = np.full((16, 16), 128.0)
    out = decode_jpeg(_encode_dc_only([y, cb, cr]))
    assert out.shape == (16, 16, 3)
    expect = _expected_dc_only(y)
    # neutral chroma → R=G=B=Y (±1 for the color-transform rounding)
    for ch in range(3):
        assert np.abs(out[:, :, ch].astype(int) - expect.astype(int)).max() <= 1


def test_color_420_subsampling():
    # luma 16x16 at 2x2 sampling, chroma 8x8 → upsampled by replication
    y = np.full((16, 16), 128.0)
    cb = np.full((8, 8), 200.0)
    cr = np.full((8, 8), 128.0)
    out = decode_jpeg(
        _encode_dc_only([y, cb, cr], sampling=[(2, 2), (1, 1), (1, 1)])
    )
    assert out.shape == (16, 16, 3)
    # Cb > 128 pushes blue up, red unchanged (BT.601)
    assert out[0, 0, 2] > out[0, 0, 0]
    b_expect = round(128 + 1.772 * (200 - 128))
    assert abs(int(out[0, 0, 2]) - b_expect) <= 1


def test_restart_markers():
    rng = np.random.default_rng(13)
    plane = rng.integers(0, 256, size=(8, 64)).astype(np.float64)
    data = _encode_dc_only([plane], restart_interval=2)
    assert b"\xff\xd0" in data  # encoder really emitted RST0
    out = decode_jpeg(data)
    assert np.array_equal(out, _expected_dc_only(plane))


def test_lossless_and_cmyk_typed():
    # progressive (SOF2) is SUPPORTED since round 6 — see
    # test_jpeg_progressive.py; the remaining SOF walls stay typed
    prog = bytearray(_encode_dc_only([np.full((8, 8), 128.0)]))
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC3  # lossless
    with pytest.raises(UnsupportedJpeg, match="SOF3"):
        decode_jpeg(bytes(prog))
    with pytest.raises(UnsupportedJpeg, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_decode_image_dispatches_jpeg():
    from tulflow_spark.ext.media_codecs import decode_image

    plane = np.full((8, 8), 77.0)
    out = decode_image(_encode_dc_only([plane]))
    assert out.shape == (8, 8) and out[0, 0] == 77
