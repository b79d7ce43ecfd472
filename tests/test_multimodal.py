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
