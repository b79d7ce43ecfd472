"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata structs, plus decode / feature-extract / resize / frame-sample
operators as Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch shapes, partitioning) is real and
tested; the actual media decoding is STUBBED — the image/audio libraries are
not present in this container.  ``decoder="stub"`` produces a deterministic
fake decode (md5-seeded) so downstream shapes are exercised end-to-end;
``decoder="pil"``/``"ffmpeg"`` raise ``NotImplementedError`` with the exact
dependency needed, never a silent fallback.

Scale notes: media bytes stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds it); feature
vectors (small) are the only thing that flows into joins/aggregations —
never re-shuffle raw media after decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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
    if decoder != "stub":
        raise ValueError(f"unknown decoder {decoder!r}")


def decode_and_featurize(
    media: DataFrame,
    decoder: str = "stub",
    resize_to: tuple[int, int] = (32, 32),
) -> DataFrame:
    """media rows → (media_id, kind, width, height, features ARRAY<FLOAT>).

    The decode + resize + feature-extract pipeline as ONE mapInPandas stage:
    raw bytes never cross a stage boundary.  Features here are a 16-bin
    intensity histogram (stub), i.e. the shape a real embedding would have.
    """
    _require_real_decoder(decoder)
    w, h = resize_to

    out_schema = (
        "media_id bigint, kind string, width int, height int, "
        "features array<float>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = _stub_pixels(bytes(r["content"]), w, h)
                hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
                feats = (hist / img.size).astype(np.float32)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "width": w,
                        "height": h,
                        "features": feats.tolist(),
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
) -> DataFrame:
    """Video → one row per sampled frame (media_id, frame_idx, ts_ms,
    frame binary).  Stub: frames are md5-derived slices; a real decoder
    plugs into the same row-expansion shape (mapInPandas is allowed to
    yield MORE rows than it consumes — this is the UDTF-ish path)."""
    _require_real_decoder(decoder)

    out_schema = "media_id bigint, frame_idx int, ts_ms bigint, frame binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
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
