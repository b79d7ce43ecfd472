"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata structs, plus decode / feature-extract / resize / frame-sample
operators as Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch shapes, partitioning) is real and
tested.  Decoding tiers:

- ``decoder="native"`` — REAL decode for the formats the stdlib can parse
  (BMP/PPM/PGM images via struct+numpy, PCM WAV via ``wave``), real
  box-filter resize, real histogram / FFT-band features
  (:mod:`tulflow_spark.ext.media_codecs`); compressed formats raise the
  typed ``UnsupportedMedia`` naming the missing dependency.
- ``decoder="stub"`` — deterministic fake decode (md5-seeded) so
  downstream shapes are exercised for any byte blob.
- ``decoder="pil"``/``"ffmpeg"`` — raise ``NotImplementedError`` with the
  exact dependency needed, never a silent fallback.

Scale notes: media bytes stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds it); feature
vectors (small) are the only thing that flows into joins/aggregations —
never re-shuffle raw media after decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from struct import error as struct_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<format:string, width:int, height:int, "
    "duration_ms:bigint, sample_rate:int>"
)

FEATURE_DIM = 16


def read_media_dir(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """binaryFile ingest → media rows with metadata stubs (format from the
    extension; intrinsic dims unknown until decode)."""
    files = spark.read.format("binaryFile").load(path)
    return files.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.regexp_extract(F.col("path"), r"\.(\w+)$", 1).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _stub_pixels(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: md5-seeded uint8 image of the target size."""
    seed = int.from_bytes(hashlib.md5(content).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def _require_real_decoder(decoder: str) -> None:
    if decoder == "pil":
        raise NotImplementedError(
            "real image decode requires Pillow, which is not installed in "
            "this container; use decoder='stub' for plumbing tests"
        )
    if decoder == "ffmpeg":
        raise NotImplementedError(
            "real audio/video decode requires ffmpeg bindings, not installed; "
            "use decoder='stub'"
        )
    if decoder not in ("stub", "native"):
        raise ValueError(f"unknown decoder {decoder!r}")


def decode_and_featurize(
    media: DataFrame,
    decoder: str = "stub",
    resize_to: tuple[int, int] = (32, 32),
) -> DataFrame:
    """media rows → (media_id, kind, width, height, features ARRAY<FLOAT>).

    The decode + resize + feature-extract pipeline as ONE mapInPandas stage:
    raw bytes never cross a stage boundary.  ``width``/``height`` are the
    SOURCE dimensions when the decoder is real (native), the target size
    for the stub.  Features: 16-bin intensity histogram of the resized
    grayscale image.
    """
    _require_real_decoder(decoder)
    w, h = resize_to

    out_schema = (
        "media_id bigint, kind string, width int, height int, "
        "features array<float>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.ext.media_codecs import (
            decode_image, resize_area, to_gray,
        )

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                if decoder == "native":
                    src = decode_image(content)
                    src_h, src_w = src.shape[:2]
                    img = resize_area(to_gray(src), w, h)
                else:
                    src_w, src_h = w, h
                    img = _stub_pixels(content, w, h)
                hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
                feats = (hist / img.size).astype(np.float32)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "width": src_w,
                        "height": src_h,
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "content").mapInPandas(
        gen, schema=out_schema
    )


def decode_audio_features(
    media: DataFrame,
    decoder: str = "native",
    n_bands: int = FEATURE_DIM,
) -> DataFrame:
    """Audio rows → (media_id, sample_rate, duration_ms, n_samples,
    features ARRAY<FLOAT>): REAL decode for PCM WAV (stdlib ``wave``) and
    Ogg/Vorbis (ext/vorbis.py, since r7) plus real FFT band-energy
    features — one mapInPandas stage, bytes never leave it.

    The stub tier fabricates a deterministic sample buffer from the md5 so
    the same schema flows for undecodable blobs in shape-only tests.
    """
    _require_real_decoder(decoder)

    out_schema = (
        "media_id bigint, sample_rate int, duration_ms bigint, "
        "n_samples bigint, features array<float>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.ext.media_codecs import (
            audio_band_energies, decode_audio,
        )

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                if decoder == "native":
                    samples, rate = decode_audio(content)
                else:
                    rate = 8000
                    raw = _stub_pixels(content, 256, 4).reshape(-1)
                    samples = (raw.astype(np.float32) - 128.0) / 128.0
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "sample_rate": rate,
                        "duration_ms": int(len(samples) * 1000 / rate),
                        "n_samples": len(samples),
                        "features": audio_band_energies(
                            samples, n_bands
                        ).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        gen, schema=out_schema
    )


def probe_media(media: DataFrame) -> DataFrame:
    """Fill the typed ``meta`` struct from the actual bytes: one
    header-level probe per blob (dimensions, duration, sample rate, frame
    count, codec) — REAL parsing for PNG/GIF/BMP/JPEG/PPM/PGM headers, WAV
    chunks, MP3 frame walks, and MP4 box trees
    (:mod:`tulflow_spark.ext.mediaprobe`); unknown formats keep NULL metadata
    rather than erroring, so one bad blob can't kill a 100 TB pass.

    This is the first stage of a multimodal pipeline at scale: later stages
    filter/partition on the probed metadata columns (e.g. ``width >= 512``)
    *before* any decode is paid for — the probe reads only header bytes.
    """
    out_schema = (
        "media_id bigint, kind string, content binary, "
        "meta struct<format:string, width:int, height:int, "
        "duration_ms:bigint, sample_rate:int, n_frames:int, codec:string>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.ext.media_codecs import UnsupportedMedia
        from tulflow_spark.ext.mediaprobe import probe_media_bytes

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                try:
                    m = probe_media_bytes(content)
                except UnsupportedMedia:
                    m = {"format": "unknown"}
                except Exception:
                    # Any malformed blob (truncated box tree, non-PCM WAV
                    # via wave.Error, missing mdhd -> TypeError, short
                    # reads -> IndexError/EOFError/struct.error) must
                    # degrade to format=unknown, not kill the task: the
                    # "one bad blob can't fail a 100 TB pass" contract.
                    m = {"format": "unknown"}
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "content": content,
                        "meta": {
                            "format": m.get("format"),
                            "width": m.get("width"),
                            "height": m.get("height"),
                            "duration_ms": m.get("duration_ms"),
                            "sample_rate": m.get("sample_rate"),
                            "n_frames": m.get("n_frames"),
                            "codec": m.get("codec"),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "content").mapInPandas(
        gen, schema=out_schema
    )


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    duration_ms: int = 5000,
    decoder: str = "stub",
    keyframe_only: bool = False,
) -> DataFrame:
    """Video → one row per sampled frame (media_id, frame_idx, ts_ms,
    frame binary).

    ``decoder="native"``: REAL ISO-BMFF demux — the sample table
    (stts/stsz/stsc/stco) is resolved and the emitted ``frame`` is the
    exact compressed sample payload from ``mdat`` at the latest decode
    timestamp ≤ each requested tick (``keyframe_only`` snaps to the
    preceding stss sync sample); ``ts_ms`` is the sample's true timestamp.
    Codec payload decode (H.264 …) remains a typed wall downstream.

    ``decoder="stub"``: frames are md5-derived tags at the requested ticks
    (same row-expansion shape for any byte blob — mapInPandas is allowed to
    yield MORE rows than it consumes; this is the UDTF-ish path)."""
    _require_real_decoder(decoder)

    out_schema = "media_id bigint, frame_idx int, ts_ms bigint, frame binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.ext.mediaprobe import mp4_sample_at, probe_mp4

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                if decoder == "native":
                    info = probe_mp4(content)
                    vid = next(
                        (t for t in info.tracks if t.handler == "vide"), None
                    )
                    if vid is None:
                        raise ValueError("mp4 has no video track")
                    horizon = min(duration_ms, vid.duration_ms or duration_ms)
                    for i, ts in enumerate(range(0, horizon, every_ms)):
                        _, actual_ms, payload = mp4_sample_at(
                            content, vid, ts, keyframe_only=keyframe_only
                        )
                        rows.append(
                            {
                                "media_id": r["media_id"],
                                "frame_idx": i,
                                "ts_ms": actual_ms,
                                "frame": payload,
                            }
                        )
                else:
                    for i, ts in enumerate(range(0, duration_ms, every_ms)):
                        tag = hashlib.md5(content + str(ts).encode()).digest()
                        rows.append(
                            {
                                "media_id": r["media_id"],
                                "frame_idx": i,
                                "ts_ms": ts,
                                "frame": tag,
                            }
                        )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(gen, schema=out_schema)
