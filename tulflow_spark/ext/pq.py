"""Product quantization (PQ) for approximate nearest-neighbor at scale.

LLM-pipeline extension (no reference analogue).  Public-knowledge
algorithm: Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011) — split each d-dim vector into ``m``
subspaces, k-means each subspace into ``ksub`` centroids, store each
vector as m one-byte codes, and score queries with an asymmetric distance
computation (ADC): a per-query (m × ksub) lookup table of partial dot
products, summed by code index.

Why this matters at 100 TB: a 64-dim float32 corpus is 256 B/vector;
PQ(m=8, ksub=16) stores 8 B/vector — 32× less scan I/O — and query
scoring is **pure JVM column algebra over the codes** (no Python, no
original vectors touched until the optional exact re-rank of the top
candidates).  The codes column is the storable index: encode once, scan
many.

Training reuses the deterministic seeding of :mod:`tulflow_spark.ext.
kmeans` (k smallest ids per subspace) and runs ALL subspaces in each pass:
one iterator-pandas-UDF assignment stage (the (m, ksub, dsub) codebook
rides in the closure) plus one ``(sub, code, pos)`` mean aggregate of
``m × ksub × dsub`` tiny rows — the vectors themselves never shuffle,
exactly like :func:`kmeans.kmeans_fit`.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _codes_udf(codebook: np.ndarray):
    """codebook: (m, ksub, dsub) float64 → UDF mapping vec → array<int> of
    per-subspace nearest-centroid codes (euclidean; first-min tie-break)."""
    m, ksub, dsub = codebook.shape

    @pandas_udf("array<int>")
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for v in batches:
            mat = np.vstack(v.to_numpy()).astype(np.float64)  # (b, d)
            sub = mat.reshape(len(mat), m, dsub)  # (b, m, dsub)
            # (b, m, ksub) squared distances via ||x-c||^2 expansion
            d2 = (
                (sub**2).sum(axis=2, keepdims=True)
                - 2.0 * np.einsum("bmd,mkd->bmk", sub, codebook)
                + (codebook**2).sum(axis=2)[None, :, :]
            )
            yield pd.Series(list(d2.argmin(axis=2).astype(np.int32)))

    return encode


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    max_iter: int = 4,
) -> np.ndarray:
    """Train the (m, ksub, dsub) codebook with Lloyd iterations over ALL
    subspaces at once.  Seeds are the sub-vectors of the ksub smallest ids
    (deterministic, like :func:`kmeans.seed_centroids`); empty codes keep
    their previous centroid."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    seed_rows = df.select(id_col, vec_col).orderBy(id_col).head(ksub)
    if len(seed_rows) < ksub:
        raise ValueError(f"need >= ksub={ksub} rows to seed")
    seeds = np.asarray([[float(x) for x in r[1]] for r in seed_rows])
    codebook = np.transpose(
        seeds.reshape(ksub, m, dsub), (1, 0, 2)
    ).copy()  # (m, ksub, dsub)

    base = df.select(vec_col)
    for _ in range(max_iter):
        enc = _codes_udf(codebook)
        assigned = base.withColumn("_codes", enc(F.col(vec_col)))
        means = (
            assigned.select(
                F.col("_codes"), F.posexplode(vec_col).alias("pos", "val")
            )
            .withColumn("sub", (F.col("pos") / dsub).cast("int"))
            .withColumn("code", F.element_at(F.col("_codes"), F.col("sub") + 1))
            .withColumn("spos", F.col("pos") % dsub)
            .groupBy("sub", "code", "spos")
            .agg(F.avg("val").alias("mval"))
            .collect()
        )
        new = codebook.copy()
        for r in means:
            new[r["sub"], r["code"], r["spos"]] = r["mval"]
        codebook = new
    return codebook


def pq_encode(
    df: DataFrame,
    codebook: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Vector → m-byte code column (the storable, 32×-smaller index)."""
    enc = _codes_udf(codebook)
    return df.withColumn(out_col, enc(F.col(vec_col)))


def _adc_lut(codebook: np.ndarray, query: Sequence[float]) -> list[list[float]]:
    """Per-subspace partial dot products query·centroid — the ADC table."""
    m, ksub, dsub = codebook.shape
    q = np.asarray(query, dtype=np.float64).reshape(m, dsub)
    return [
        [float(np.dot(q[s], codebook[s, c])) for c in range(ksub)]
        for s in range(m)
    ]


def pq_topk(
    encoded: DataFrame,
    codebook: np.ndarray,
    query: Sequence[float],
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    k: int = 10,
    rerank: int = 0,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over the codes column — pure JVM column algebra.

    The (m × ksub) LUT enters the plan as a nested array literal; the score
    is ``aggregate(sequence(0, m-1), 0d, acc + LUT[s][codes[s]])`` — no
    Python in the scan, and `orderBy().limit` stays TakeOrderedAndProject.
    With ``rerank > 0``, the top ``rerank`` candidates (only) are re-scored
    with exact cosine on the original vectors — the standard two-stage
    recall repair, touching full vectors for a k-row-scale subset."""
    m = codebook.shape[0]
    lut = F.array(
        *[
            F.array(*[F.lit(v) for v in row])
            for row in _adc_lut(codebook, query)
        ]
    )
    scored = encoded.withColumn(
        "pq_score",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, s: acc
            + F.element_at(
                F.element_at(lut, s + 1),
                F.element_at(F.col(codes_col), s + 1) + 1,
            ),
        ),
    )
    if not rerank:
        return (
            scored.select(id_col, "pq_score")
            .orderBy(F.col("pq_score").desc(), F.col(id_col))
            .limit(k)
        )
    from tulflow_spark.ext.similarity import cosine

    qcol = F.array(*[F.lit(float(x)) for x in query])
    cands = (
        scored.orderBy(F.col("pq_score").desc(), F.col(id_col))
        .limit(rerank)
        .withColumn("cosine_sim", cosine(F.col(vec_col), qcol))
    )
    return (
        cands.select(id_col, "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


__all__ = ["pq_train", "pq_encode", "pq_topk"]
