"""Progressive JPEG (SOF2) decoder: multi-scan streams assembled by an
in-test encoder (DC first/refine + AC first with cross-block EOB runs)
checked against an independent IDCT, plus HAND-BUILT AC-refinement
streams whose every bit is derived in comments — the correction-bit
procedure is the subtlest part of G.1.2.3 and gets explicit coverage."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tulflow_spark.ext.jpeg import UnsupportedJpeg, decode_jpeg
from tests.test_jpeg import _BitWriter, _dht, _seg

ZIGZAG = [
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _expected_pixels(blocks):
    """Independent IDCT of zigzag coefficient rows (quant all-ones):
    blocks is (bh, bw, 64) int -> (bh*8, bw*8) uint8."""
    C = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            C[k, n] = np.cos(np.pi * k * (2 * n + 1) / 16) * (
                np.sqrt(0.125) if k == 0 else 0.5
            )
    bh, bw = blocks.shape[:2]
    out = np.zeros((bh * 8, bw * 8))
    for by in range(bh):
        for bx in range(bw):
            m = np.zeros(64)
            m[ZIGZAG] = blocks[by, bx]
            px = C.T @ m.reshape(8, 8) @ C + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
    return np.clip(out.round(), 0, 255).astype(np.uint8)


def _huff_for(symbols):
    """All used symbols at one canonical length -> (counts, syms, enc)."""
    syms = sorted(set(symbols)) or [0]
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return counts, bytes(syms), enc


def _sof2(h, w):
    return _seg(0xC2, bytes([8]) + struct.pack(">HH", h, w)
                + bytes([1, 1, 0x11, 0]))


def _sos1(ss, se, ah, al, td=0, ta=0):
    return _seg(0xDA, bytes([1, 1, td << 4 | ta, ss, se, ah << 4 | al]))


def _magbits(v):
    t = abs(v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_progressive(blocks, al_dc=1, restart_interval=0):
    """Grayscale progressive stream for a (bh, bw, 64) zigzag coefficient
    grid: scan 1 = DC first at Al=al_dc, scan 2 = AC 1-63 first at Al=0
    (full AC precision, cross-block EOB runs), scan 3 = DC refinement
    bits down to Al=0.  Quant table all ones."""
    bh, bw = blocks.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _sof2(bh * 8, bw * 8)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    flat = [blocks[by, bx] for by in range(bh) for bx in range(bw)]
    rst = 0

    # --- scan 1: DC first, Al=al_dc -------------------------------------
    events = []  # (sym, extra_value, extra_bits)
    pred = 0
    per_block_dc = []
    for i, c in enumerate(flat):
        if restart_interval and i and i % restart_interval == 0:
            per_block_dc.append(None)  # restart boundary
            pred = 0
        v = int(c[0]) >> al_dc
        t, bits = _magbits(v - pred)
        per_block_dc.append((t, bits))
        pred = v
    counts, syms, enc = _huff_for(
        [t for e in per_block_dc if e for t, _ in [e]]
    )
    out += _dht(0, 0, counts, syms)
    out += _sos1(0, 0, 0, al_dc)
    writer = _BitWriter()
    scan = bytearray()
    for e in per_block_dc:
        if e is None:
            scan += writer.tobytes()
            scan += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            writer = _BitWriter()
            continue
        t, bits = e
        code, ln = enc[t]
        writer.write(code, ln)
        if t:
            writer.write(bits, t)
    scan += writer.tobytes()
    out += scan

    # --- scan 2: AC 1-63 first, Al=0, with EOB runs ---------------------
    # restart intervals bound EOB runs (a run may not cross a boundary)
    groups = (
        [flat[i : i + restart_interval]
         for i in range(0, len(flat), restart_interval)]
        if restart_interval
        else [flat]
    )
    all_events = []
    for grp in groups:
        events = []
        i = 0
        while i < len(grp):
            c = grp[i]
            nz = [k for k in range(1, 64) if c[k]]
            if not nz:
                run = 0
                while i + run < len(grp) and not any(
                    grp[i + run][k] for k in range(1, 64)
                ):
                    run += 1
                r = run.bit_length() - 1
                events.append((r << 4, run - (1 << r), r))
                i += run
                continue
            k = 1
            for kk in nz:
                r = kk - k
                while r >= 16:
                    events.append((0xF0, 0, 0))
                    r -= 16
                t, bits = _magbits(int(c[kk]))
                events.append((r << 4 | t, bits, t))
                k = kk + 1
            if k <= 63:
                events.append((0x00, 0, 0))  # EOB just this block
            i += 1
        all_events.append(events)
    counts, syms, enc = _huff_for(
        [s for ev in all_events for s, _, _ in ev]
    )
    out += _dht(1, 0, counts, syms)
    out += _sos1(1, 63, 0, 0)
    scan = bytearray()
    rst = 0
    for gi, events in enumerate(all_events):
        if gi:
            scan += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
        writer = _BitWriter()
        for s, bits, n in events:
            code, ln = enc[s]
            writer.write(code, ln)
            if n:
                writer.write(bits, n)
        scan += writer.tobytes()
    out += scan

    # --- scan 3: DC refinement down to Al=0 -----------------------------
    for lvl in range(al_dc - 1, -1, -1):
        out += _sos1(0, 0, al_dc - lvl, lvl)
        scan = bytearray()
        writer = _BitWriter()
        for i, c in enumerate(flat):
            if restart_interval and i and i % restart_interval == 0:
                scan += writer.tobytes()
                scan += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                writer = _BitWriter()
            writer.write((int(c[0]) >> lvl) & 1, 1)
        scan += writer.tobytes()
        out += scan

    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_equals_independent_idct():
    rng = np.random.default_rng(23)
    blocks = np.zeros((2, 3, 64), np.int64)
    # random low-band coefficients incl. negatives; some blocks AC-empty
    for by in range(2):
        for bx in range(3):
            if (by + bx) % 3 != 2:
                blocks[by, bx, 0] = int(rng.integers(-200, 200))
                for k in rng.choice(range(1, 20), size=4, replace=False):
                    blocks[by, bx, k] = int(rng.integers(-30, 30))
            else:
                blocks[by, bx, 0] = int(rng.integers(-200, 200))
    out = decode_jpeg(_encode_progressive(blocks))
    assert np.array_equal(out, _expected_pixels(blocks))


def test_progressive_eob_runs_across_blocks():
    # 8 blocks, only the first and last carry AC -> a 6-block EOB run
    blocks = np.zeros((1, 8, 64), np.int64)
    blocks[0, 0, 0] = 40
    blocks[0, 0, 5] = 12
    blocks[0, 7, 9] = -7
    out = decode_jpeg(_encode_progressive(blocks))
    assert np.array_equal(out, _expected_pixels(blocks))


def test_progressive_high_zigzag_needs_zrl():
    blocks = np.zeros((1, 1, 64), np.int64)
    blocks[0, 0, 0] = 16
    blocks[0, 0, 40] = 9  # >16 zigzag positions past the previous nonzero
    out = decode_jpeg(_encode_progressive(blocks))
    assert np.array_equal(out, _expected_pixels(blocks))


def test_progressive_restart_markers():
    rng = np.random.default_rng(31)
    blocks = np.zeros((1, 6, 64), np.int64)
    for bx in range(6):
        blocks[0, bx, 0] = int(rng.integers(-100, 100))
    data = _encode_progressive(blocks, restart_interval=2)
    assert b"\xff\xd0" in data
    out = decode_jpeg(data)
    assert np.array_equal(out, _expected_pixels(blocks))


def test_progressive_multibit_dc_refinement():
    # Al=2 first scan then TWO refinement scans; DC values exercise all
    # bit patterns across the refinements
    blocks = np.zeros((1, 4, 64), np.int64)
    for bx, dc in enumerate((7, -13, 100, -1)):
        blocks[0, bx, 0] = dc
    out = decode_jpeg(_encode_progressive(blocks, al_dc=2))
    assert np.array_equal(out, _expected_pixels(blocks))


def _handbuilt_refinement_stream(ac_events, prelude_coeffs):
    """One 8x8 gray block: scan 1 plants `prelude_coeffs` (AC first at
    Al=1, values must be even), scan 2 is the hand-written AC refinement
    (Ah=1, Al=0) given as explicit (kind, payload) events:
    ('sym', s) huffman AC symbol, ('bit', b) raw bit."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _sof2(8, 8)
    # DC first scan: DC = 0 (symbol t=0 only)
    counts, syms, enc = _huff_for([0])
    out += _dht(0, 0, counts, syms)
    out += _sos1(0, 0, 0, 0)
    w = _BitWriter()
    code, ln = enc[0]
    w.write(code, ln)
    out += w.tobytes()
    # AC first scan at Al=1 planting history (values >> 1)
    events = []
    k = 1
    for kk in sorted(prelude_coeffs):
        v = prelude_coeffs[kk] >> 1
        r = kk - k
        t, bits = _magbits(v)
        events.append((r << 4 | t, bits, t))
        k = kk + 1
    if k <= 63:
        events.append((0x00, 0, 0))
    counts, syms, enc = _huff_for([s for s, _, _ in events])
    out += _dht(1, 0, counts, syms)
    out += _sos1(1, 63, 0, 1)
    w = _BitWriter()
    for s, bits, n in events:
        code, ln = enc[s]
        w.write(code, ln)
        if n:
            w.write(bits, n)
    out += w.tobytes()
    # hand-built refinement scan (Ah=1, Al=0)
    counts, syms, enc = _huff_for(
        [p for kind, p in ac_events if kind == "sym"]
    )
    out += _dht(1, 1, counts, syms)
    out += _sos1(1, 63, 1, 0, ta=1)
    w = _BitWriter()
    for kind, p in ac_events:
        if kind == "sym":
            code, ln = enc[p]
            w.write(code, ln)
        else:
            w.write(p, 1)
    out += w.tobytes()
    out += b"\xff\xd9"
    return bytes(out)


def test_ac_refinement_hand_built_plant_and_correct():
    """History (Al=1 scan): c1=2, c4=-2.  Refinement plants +1 at c2 and
    corrects both history coefficients to odd magnitudes.

    Decoder trace for the refinement bits below:
    sym (0,1) + sign 1  -> newval=+1; advance: k=1 nonzero -> corr bit 1
    (2 -> 3); k=2 zero-history with r=0 -> plant +1; k=3.
    sym (0,0) EOB=1 -> trailing corrections from k=3: c4 corr bit 1
    (-2 -> -3).  Final: c1=3, c2=1, c4=-3."""
    stream = _handbuilt_refinement_stream(
        [
            ("sym", 0x01), ("bit", 1),   # plant +1, run 0
            ("bit", 1),                   # correction for c1
            ("sym", 0x00),                # EOB (run 1)
            ("bit", 1),                   # correction for c4
        ],
        {1: 2, 4: -2},
    )
    expect = np.zeros((1, 1, 64), np.int64)
    expect[0, 0, 1] = 3
    expect[0, 0, 2] = 1
    expect[0, 0, 4] = -3
    out = decode_jpeg(stream)
    assert np.array_equal(out, _expected_pixels(expect))


def test_ac_refinement_hand_built_no_change_bits():
    """Correction bits of 0 leave history magnitudes unchanged, and a
    plant after a zero-history run: history c3=4; refinement plants -1
    at c6 (two zero-history coeffs passed: c4... wait c4,c5).

    Trace: sym (2,1) + sign 0 -> newval=-1, r=2; advance: k=1,2 zero
    (r 2->1->0... k=1 zero r=2->1, k=2 zero r=1->0, k=3 nonzero -> corr
    bit 0 (stays 4), k=4 zero r==0 -> break -> plant at k=4?  To plant
    at c6 the run counts ONLY zero-history coeffs: k=1 (r->1), k=2
    (r->0), k=3 corr, k=4 break-plant... so run 2 plants at c4 when c3
    is nonzero.  Plant target c4; final: c3=4, c4=-1; EOB trailing none
    (k=5..63 all zero, no corr bits)."""
    stream = _handbuilt_refinement_stream(
        [
            ("sym", 0x21), ("bit", 0),   # run 2, plant -1
            ("bit", 0),                   # correction for c3: unchanged
            ("sym", 0x00),                # EOB closes the block
        ],
        {3: 4},
    )
    expect = np.zeros((1, 1, 64), np.int64)
    expect[0, 0, 3] = 4
    expect[0, 0, 4] = -1
    out = decode_jpeg(stream)
    assert np.array_equal(out, _expected_pixels(expect))


def test_non_dct_sofs_stay_typed():
    prog = bytearray(_encode_progressive(np.zeros((1, 1, 64), np.int64)))
    i = prog.index(b"\xff\xc2")
    prog[i + 1] = 0xC3  # lossless
    with pytest.raises(UnsupportedJpeg, match="SOF3"):
        decode_jpeg(bytes(prog))


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    both the header walk and the entropy-end scan must skip them."""
    data = bytearray(_encode_progressive(np.asarray(
        [[[16] + [0] * 63]], np.int64)))
    # double every marker's leading FF after SOI (crude but spec-legal:
    # insert ONE fill byte before the first SOS)
    i = data.index(b"\xff\xda")
    data[i:i] = b"\xff"
    out = decode_jpeg(bytes(data))
    expect = _expected_pixels(np.asarray([[[16] + [0] * 63]], np.int64))
    assert np.array_equal(out, expect)


def test_baseline_corrupt_marker_stays_typed():
    """The strict baseline reader still raises on a stray non-RST marker
    inside scan data (the progressive relaxation must not silently turn
    baseline corruption into 1-bit padding)."""
    from tests.test_jpeg import _encode_dc_only

    data = bytearray(_encode_dc_only([np.full((8, 16), 128.0)]))
    sos = data.index(b"\xff\xda")
    # SOS segment is 12 bytes (marker+len+1-comp header); plant a bogus
    # DHT marker at the very start of the entropy data so the first DC
    # decode hits it
    data[sos + 12 : sos + 12] = b"\xff\xc4"
    with pytest.raises(UnsupportedJpeg, match="unexpected marker|Huffman"):
        decode_jpeg(bytes(data))


def test_fill_byte_before_eoi_in_baseline_scan():
    """A fill byte immediately before EOI (…FF FF D9) is spec-legal in
    BASELINE scan data too — the strict reader must treat it as end
    padding, not an unexpected marker."""
    from tests.test_jpeg import _encode_dc_only, _expected_dc_only

    plane = np.full((8, 8), 150.0)
    data = bytearray(_encode_dc_only([plane]))
    assert data[-2:] == b"\xff\xd9"
    data[-2:-2] = b"\xff"  # fill byte before EOI
    out = decode_jpeg(bytes(data))
    assert np.array_equal(out, _expected_dc_only(plane))
