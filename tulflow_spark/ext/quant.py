"""Scalar (uint8) embedding quantization: per-dimension min/max affine
codes — the storage-tier compression step of an embedding pipeline (4× over
float32, 8× over float64) that keeps *per-dimension* resolution, in
contrast to PQ's subspace codebooks (ext/pq.py).  Decode is exact affine
reconstruction; the max per-vector reconstruction error is bounded by
scale/2 per dimension, and the operator exposes it as a column so a
pipeline can gate on it.

Scale shape (100 TB of vectors):

- fit: ONE pass — per-dimension min/max via ``posexplode`` + partial-agg
  ``groupBy(pos)`` (shuffle rows bounded at partitions × d); the d-row
  result is collected because it IS the model (same doctrine as
  ext/kmeans.py's k×d centroids).
- encode: pure JVM column algebra against d-element literals —
  ``transform(zip(vec, mins, scales))`` with floor(+0.5) rounding; no
  Python, no shuffle.  Every arithmetic step is IEEE-deterministic and
  mirrored op-for-op in the DuckDB oracle (ss10), so codes are
  reproducible byte-for-byte on any engine.

No reference analogue (the reference processes XML); LLM-pipeline
extension surface beside ss8/ss9's codebook quantizers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# uint8 code range 0..255 (codes are materialized as INT in the frame;
# downcast to an UNSIGNED byte at rest — a signed int8 holds only -128..127)
LEVELS = 255


def fit_minmax(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """One pass → (mins, maxs) per dimension (the d-sized model)."""
    rows = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .orderBy("pos")
        .collect()
    )
    return [r["mn"] for r in rows], [r["mx"] for r in rows]


def quantize(
    df: DataFrame,
    mins: list[float],
    maxs: list[float],
    vec_col: str = "embedding",
    codes_col: str = "q_codes",
    err_col: str = "max_abs_err",
) -> DataFrame:
    """Add int codes + exact max reconstruction error, all JVM-side.

    code_i  = floor((x_i - mn_i) / scale_i + 0.5),  scale_i = (mx-mn)/255
    recon_i = mn_i + code_i * scale_i
    err     = max_i |recon_i - x_i|   (0 for constant dimensions)
    """
    mins_lit = F.array(*[F.lit(float(m)) for m in mins])
    scales_lit = F.array(
        *[F.lit((float(mx) - float(mn)) / LEVELS)
          for mn, mx in zip(mins, maxs)]
    )
    vec = F.col(vec_col).cast("array<double>")
    idx = F.sequence(F.lit(1), F.size(vec))
    code = lambda i: F.when(  # noqa: E731
        F.element_at(scales_lit, i) == 0.0, F.lit(0)
    ).otherwise(
        F.floor(
            (F.element_at(vec, i) - F.element_at(mins_lit, i))
            / F.element_at(scales_lit, i)
            + F.lit(0.5)
        ).cast("int")
    )
    recon_err = lambda i: F.abs(  # noqa: E731
        F.element_at(mins_lit, i)
        + code(i).cast("double") * F.element_at(scales_lit, i)
        - F.element_at(vec, i)
    )
    return df.withColumn(
        codes_col, F.transform(idx, code)
    ).withColumn(
        err_col,
        F.array_max(F.transform(idx, recon_err)),
    )


__all__ = ["LEVELS", "fit_minmax", "quantize"]
