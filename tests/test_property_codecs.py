"""Property-based tests (hypothesis) for the round-5 pure-Python surfaces:
media codec round-trips and the XSLT format-number/ tokenize helpers.
These have no Spark dependency — they harden the per-partition engines the
executors run."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tulflow_spark.transform.xpath1 import DecimalFormat, format_number


@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=50, deadline=None)
def test_png_roundtrip_property(h, w, color_idx):
    from tests.test_media_codecs import _make_png_raw
    from tulflow_spark.ext.media_codecs import decode_image

    color_type, ch = [(0, 1), (2, 3), (4, 2), (6, 4)][color_idx]
    rng = np.random.default_rng(h * 100 + w * 10 + color_idx)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    flat = img.reshape(h, -1)
    scan = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    out = decode_image(_make_png_raw(w, h, color_type, scan))
    assert np.array_equal(out, img)


@given(st.integers(min_value=1, max_value=7), st.integers(min_value=1, max_value=9))
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(h, w):
    from tests.test_media_codecs import make_gif
    from tulflow_spark.ext.media_codecs import decode_image

    rng = np.random.default_rng(h * 31 + w)
    palette = [(i * 37 % 256, i * 59 % 256, i * 83 % 256) for i in range(8)]
    idx = rng.integers(0, 8, size=(h, w), dtype=np.uint8)
    out = decode_image(make_gif(idx, palette))
    assert np.array_equal(out, np.array(palette, np.uint8)[idx])


@given(st.lists(st.integers(min_value=0, max_value=255), min_size=8, max_size=256))
@settings(max_examples=40, deadline=None)
def test_jpeg_dc_only_property(vals):
    from tests.test_jpeg import _encode_dc_only, _expected_dc_only
    from tulflow_spark.ext.jpeg import decode_jpeg

    n_blocks = max(1, len(vals) // 8)
    plane = np.zeros((8, 8 * n_blocks), np.float64)
    for b in range(n_blocks):
        for i in range(8):
            plane[i, b * 8 : (b + 1) * 8] = vals[(b * 8 + i) % len(vals)]
    out = decode_jpeg(_encode_dc_only([plane]))
    assert np.array_equal(out, _expected_dc_only(plane))


@given(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    )
)
@settings(max_examples=100, deadline=None)
def test_format_number_default_picture_parses_back(x):
    # '0.######' must emit a plain decimal that parses back to the value
    # rounded half-even at 6 places
    s = format_number(x, "0.######", DecimalFormat())
    assert abs(float(s) - x) <= 0.5 * 10**-6 + abs(x) * 1e-12


@given(st.floats(min_value=0, max_value=1e7, allow_nan=False))
@settings(max_examples=60, deadline=None)
def test_format_number_grouping_strips_back(x):
    s = format_number(x, "#,##0.##", DecimalFormat())
    assert float(s.replace(",", "")) == pytest.approx(round(x, 2), abs=0.51 * 1e-2)
    # grouping separators appear every 3 integer digits
    intpart = s.split(".")[0]
    for chunk in intpart.split(",")[1:]:
        assert len(chunk) == 3


@given(st.lists(st.sampled_from("ab c;,"), max_size=30).map("".join))
@settings(max_examples=60, deadline=None)
def test_tokenize_matches_re_split(s):
    import re

    from tulflow_spark.transform.xpath1 import Context, Node, ROOT, compile_expr

    ctx = Context(Node(ROOT), vars={"s": s})
    got = compile_expr("tokenize($s, ';')").evaluate(ctx)
    texts = [n.value for n in got]
    assert texts == ([] if s == "" else re.split(";", s))


@given(
    st.integers(min_value=1, max_value=60),
    st.sampled_from([32, 64, 128, 192, 320]),
    st.sampled_from([44100, 48000, 32000]),
)
@settings(max_examples=40, deadline=None)
def test_mp3_walk_roundtrip_property(n, kbps, rate):
    from tests.test_mediaprobe import make_mp3_frames
    from tulflow_spark.ext.mediaprobe import probe_mp3

    info = probe_mp3(make_mp3_frames(n, kbps=kbps, rate=rate))
    assert info.n_frames == n
    assert info.sample_rate == rate
    assert info.bitrate_kbps == float(kbps)
    assert info.duration_ms == n * 1152 * 1000 // rate


@given(st.lists(st.integers(min_value=1, max_value=64), min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_mp4_sample_table_roundtrip_property(sizes):
    from tests.test_mediaprobe import make_mp4
    from tulflow_spark.ext.mediaprobe import probe_mp4

    frames = [bytes([65 + (i % 26)]) * s for i, s in enumerate(sizes)]
    data = make_mp4(frames)
    (tr,) = probe_mp4(data).tracks
    assert tr.sample_sizes == sizes
    for i, f in enumerate(frames):
        off, sz = tr.sample_offsets[i], tr.sample_sizes[i]
        assert data[off : off + sz] == f


@given(st.lists(st.sampled_from(["alpha", "beta", "g", "dd", "e5"]),
                min_size=0, max_size=30))
@settings(max_examples=40, deadline=None)
def test_html_extract_plain_words_identity(words):
    # markup-free word text must extract to exactly its normalized form
    from tulflow_spark.ext.html import extract_html

    text = "  ".join(words)
    got = extract_html("<html><body><p>" + text + "</p></body></html>")
    assert got["text"] == " ".join(text.split())
