"""Property tests for the round-7 pure logic (no Spark session):
Vorbis bit plumbing, canonical Huffman assignment, IMDCT/window algebra,
and the numeric scorer's forward pass."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tulflow_spark.ext.vorbis import (
    BitReader,
    assign_codewords,
    float32_unpack,
    ilog,
    imdct,
    vorbis_window,
)


@given(st.lists(st.tuples(st.integers(0, (1 << 24) - 1),
                          st.integers(1, 24)),
                min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_bitreader_roundtrips_lsb_writer(fields):
    """Any (value, width) sequence written LSB-first reads back exactly."""
    bits: list[int] = []
    for v, n in fields:
        v &= (1 << n) - 1
        for i in range(n):
            bits.append((v >> i) & 1)
    data = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            data[i >> 3] |= 1 << (i & 7)
    br = BitReader(bytes(data))
    for v, n in fields:
        assert br.read(n) == (v & ((1 << n) - 1))


@st.composite
def _kraft_lengths(draw):
    """Codeword length lists satisfying Kraft equality (a full tree) —
    what a legal non-sparse Vorbis codebook carries."""
    # build by splitting leaves of a full binary tree (root split once:
    # two depth-1 leaves; every further split preserves the Kraft sum)
    leaves = [1, 1]
    for _ in range(draw(st.integers(0, 12))):
        i = draw(st.integers(0, len(leaves) - 1))
        if leaves[i] >= 24:
            continue
        depth = leaves.pop(i)
        leaves += [depth + 1, depth + 1]
    return draw(st.permutations(leaves))


@given(_kraft_lengths())
@settings(max_examples=80, deadline=None)
def test_assign_codewords_prefix_free_and_complete(lengths):
    got = assign_codewords(list(lengths))
    # lengths preserved; codewords prefix-free
    words = []
    for e, l in enumerate(lengths):
        code, length = got[e]
        assert length == l
        words.append((code, length))
    for i, (c1, l1) in enumerate(words):
        for j, (c2, l2) in enumerate(words):
            if i == j:
                continue
            lo = min(l1, l2)
            assert (c1 >> (l1 - lo)) != (c2 >> (l2 - lo)), (
                "prefix collision"
            )
    # full tree: Kraft sum == 1
    assert sum(2.0 ** -l for l in lengths) == 1.0


@given(st.integers(0, 1 << 20))
def test_ilog_matches_bit_length(x):
    assert ilog(x) == x.bit_length()


@given(st.integers(0, 0x1FFFFF), st.integers(770, 800), st.booleans())
def test_float32_unpack_formula(mantissa, exponent, neg):
    x = (int(neg) << 31) | (exponent << 21) | mantissa
    expect = mantissa * 2.0 ** (exponent - 788)
    assert float32_unpack(x) == (-expect if neg else expect)


@given(st.integers(3, 6), st.integers(0, 200))
@settings(max_examples=30, deadline=None)
def test_imdct_single_bin_matches_direct_formula(log2n, seed):
    n = 1 << log2n
    rng = np.random.default_rng(seed)
    k = int(rng.integers(0, n // 2))
    amp = float(rng.uniform(0.1, 2.0))
    spec = np.zeros(n // 2)
    spec[k] = amp
    got = imdct(spec)
    j = np.arange(n)
    expect = amp * np.cos(np.pi / (2 * n) * (2 * j + 1 + n // 2)
                          * (2 * k + 1))
    assert np.allclose(got, expect, atol=1e-12)


@given(st.sampled_from([64, 128, 256, 512]))
def test_vorbis_window_tdac_power_complement(n):
    """Princen-Bradley condition: w[i]^2 + w[i + n/2]^2 == 1 over the
    first half — the identity that makes lapped IMDCT reconstruction
    exact."""
    w = vorbis_window(n, n // 2, n // 2)
    s = w[: n // 2] ** 2 + w[n // 2 :] ** 2
    assert np.allclose(s, 1.0, atol=1e-12)


_txt = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Zs")), max_size=60
)


@given(_txt, _txt)
@settings(max_examples=60, deadline=None)
def test_numeric_scorer_bounds_and_round9(q, d):
    from tulflow_spark.ext.numeric_scorer import NumericScorer

    s = NumericScorer()
    got = s(pd.Series([q]), pd.Series([d]))[0]
    assert 0.0 < got < 1.0
    # 9-decimal idempotence (the engine-exact contract)
    assert got == math.copysign(math.floor(abs(got) * 1e9 + 0.5), got) / 1e9


@given(st.lists(st.integers(0, 255), min_size=2, max_size=2),
       st.integers(1, 120))
@settings(max_examples=60, deadline=None)
def test_render_line_endpoints_and_monotone_steps(ys, x1):
    """The Bresenham render hits y0 at x0 exactly and every step moves by
    base or base±1 (the spec's two slopes)."""
    from tulflow_spark.ext.vorbis import _render_line

    y0, y1 = ys
    v = np.zeros(x1 + 1, dtype=np.int64)
    _render_line(0, y0, x1, y1, v)
    assert v[0] == y0
    dy = y1 - y0
    base = int(dy / x1)
    sy = base + 1 if dy >= 0 else base - 1
    steps = np.diff(v[:x1])
    assert set(steps.tolist()) <= {base, sy}
    # total rise over the rendered span stays within one step of the line
    if x1 > 1:
        ideal = y0 + dy * (x1 - 1) / x1
        assert abs(v[x1 - 1] - ideal) <= 1.0
