"""Multimodal plumbing tests: binary ingest schema, deterministic stub
decode → feature shape, frame sampling row expansion, real-decoder gates."""

from __future__ import annotations

import pytest

from tulflow_spark.ext import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    (d / "a.png").write_bytes(b"\x89PNG-fake-a")
    (d / "b.jpg").write_bytes(b"\xff\xd8-fake-b")
    return MM.read_media_dir(spark, str(d), kind="image")


def test_read_media_dir_schema(media_df):
    assert media_df.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,content:binary,"
        "meta:struct<format:string,width:int,height:int,"
        "duration_ms:bigint,sample_rate:int>>"
    )
    rows = media_df.collect()
    assert {r.meta.format for r in rows} == {"png", "jpg"}
    assert all(r.media_id is not None for r in rows)


def test_decode_and_featurize_stub(media_df):
    out = MM.decode_and_featurize(media_df, resize_to=(16, 8))
    rows = out.collect()
    assert len(rows) == 2
    for r in rows:
        assert (r.width, r.height) == (16, 8)
        assert len(r.features) == MM.FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-5  # normalized histogram
    # determinism: same input → same features
    again = MM.decode_and_featurize(media_df, resize_to=(16, 8)).collect()
    assert {tuple(r.features) for r in rows} == {tuple(r.features) for r in again}


def test_sample_frames_expansion(media_df):
    frames = MM.sample_frames(media_df, every_ms=500, duration_ms=2000)
    rows = frames.collect()
    assert len(rows) == 2 * 4  # 2 videos × 4 sampled frames
    one = [r for r in rows if r.frame_idx == 0][0]
    assert one.ts_ms == 0 and len(bytes(one.frame)) == 16


def test_real_decoders_gate(media_df):
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.decode_and_featurize(media_df, decoder="pil")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        MM.sample_frames(media_df, decoder="ffmpeg")
    with pytest.raises(ValueError):
        MM.decode_and_featurize(media_df, decoder="nope")


def test_probe_media_fills_meta_from_real_bytes(spark, tmp_path_factory):
    import struct as _s

    from tests.test_media_codecs import _make_png_raw
    from tests.test_mediaprobe import make_mp3_frames, make_mp4

    d = tmp_path_factory.mktemp("probe")
    png = _make_png_raw(6, 4, 0, b"".join(b"\x00" + b"\x20" * 6 for _ in range(4)))
    (d / "img.png").write_bytes(png)
    (d / "clip.mp4").write_bytes(make_mp4([b"f" * 9] * 50, width=128, height=96))
    (d / "song.mp3").write_bytes(make_mp3_frames(20, kbps=128, rate=44100))
    (d / "junk.bin").write_bytes(b"\x00\x01\x02 not media")

    probed = MM.probe_media(MM.read_media_dir(spark, str(d), kind="mixed"))
    rows = {r.meta.format: r for r in probed.collect()}
    assert (rows["png"].meta.width, rows["png"].meta.height) == (6, 4)
    assert rows["mp4"].meta.n_frames == 50
    assert rows["mp4"].meta.duration_ms == 2000
    assert (rows["mp4"].meta.width, rows["mp4"].meta.height) == (128, 96)
    assert rows["mp3"].meta.sample_rate == 44100
    assert rows["mp3"].meta.n_frames == 20
    assert rows["unknown"].meta.width is None


def test_probe_media_survives_malformed_blobs(spark, tmp_path_factory):
    """One bad blob must degrade to format=unknown, never fail the task
    (r5 ADVICE): malformed WAV (wave.Error), MP4 with a trak missing mdhd
    (TypeError), and truncated box trees all ride the same escape hatch."""
    from tests.test_mediaprobe import make_mp4

    d = tmp_path_factory.mktemp("badmedia")
    # RIFF/WAVE magic but garbage chunk layout -> wave.open raises
    (d / "bad.wav").write_bytes(b"RIFF\x24\x00\x00\x00WAVE" + b"\xff" * 40)
    # valid mp4 start, box tree truncated mid-moov
    good = make_mp4([b"f" * 9] * 5)
    (d / "trunc.mp4").write_bytes(good[: len(good) // 3])
    # ftyp + moov containing a trak with no mdhd
    (d / "nomdhd.mp4").write_bytes(
        b"\x00\x00\x00\x14ftypisom\x00\x00\x00\x00isom"
        b"\x00\x00\x00\x10moov\x00\x00\x00\x08trak"
    )

    probed = MM.probe_media(MM.read_media_dir(spark, str(d), kind="mixed"))
    rows = probed.collect()
    assert len(rows) == 3
    for r in rows:
        assert r.meta.width is None and r.meta.n_frames is None


def test_sample_frames_native_mp4(spark, tmp_path_factory):
    from tests.test_mediaprobe import make_mp4

    d = tmp_path_factory.mktemp("vids")
    frames = [f"FRAME{i}".encode() * (i + 1) for i in range(25)]  # 25fps, 1s
    (d / "v.mp4").write_bytes(make_mp4(frames, frame_delta=40, sync=[1, 13]))

    media = MM.read_media_dir(spark, str(d), kind="video")
    out = MM.sample_frames(
        media, every_ms=200, duration_ms=10_000, decoder="native"
    ).collect()
    # horizon clamps to the real 1000ms duration → 5 ticks (0,200,...,800)
    assert len(out) == 5
    by_idx = {r.frame_idx: r for r in out}
    assert bytes(by_idx[0].frame) == frames[0] and by_idx[0].ts_ms == 0
    # 200ms at 40ms/frame → sample 5
    assert bytes(by_idx[1].frame) == frames[5] and by_idx[1].ts_ms == 200
    # keyframe-only: every tick snaps back to sync samples 1/13 (0ms, 480ms)
    kf = MM.sample_frames(
        media, every_ms=200, duration_ms=10_000, decoder="native",
        keyframe_only=True,
    ).collect()
    assert {bytes(r.frame) for r in kf} <= {frames[0], frames[12]}
