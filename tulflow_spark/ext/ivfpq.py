"""IVF-PQ approximate nearest neighbor (the IVFADC layout of Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 §V): a
coarse k-means quantizer prunes the corpus to ``n_probes`` clusters, and a
product quantizer over the RESIDUALS (vector − assigned centroid) scores
candidates from 8-byte codes — the standard billion-scale ANN composition,
combining this repo's IVF (ext/ivf.py, partition pruning) and PQ
(ext/pq.py, 32× scan compression) stages.

Scale shape (100 TB of vectors):

- build: one deterministic ``ext.kmeans`` fit for the coarse quantizer
  (seed centroids = k smallest ids → partition-insensitive clusters,
  unlike pyspark.ml's k-means|| init), one residual column (pure JVM
  ``zip_with`` against a broadcast k×d centroid literal), one global
  PQ codebook trained on residuals (``pq_train`` — vectors never
  shuffle), one encode pass.  Stored output = (id, cluster, codes):
  cluster-partitioned parquet makes probes directory-pruned scans
  (``ext/ann_store.py`` layout), codes are m bytes per vector.
- query: for inner-product/cosine scoring the ADC decomposes as
  ``q·(centroid_c + residual) ≈ q·centroid_c + Σ_s LUT[s][code_s]`` — ONE
  shared LUT (query · residual codebook, m×ksub literal) plus a
  per-cluster scalar offset (k-element literal).  Scoring is pure JVM
  column algebra (``aggregate`` over the code array — no Python in the
  scan, same pin as ss8), followed by TakeOrderedAndProject top-k.
- optional exact re-rank of the top ``rerank`` candidates only.

No reference analogue (the reference processes XML, not vectors); this is
part of the LLM-pipeline extension surface beside ss3 (sign-LSH), ss4
(IVF), ss8 (flat PQ).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tulflow_spark.ext.pq import _adc_lut, pq_encode, pq_train


@dataclass
class IvfPqIndex:
    centroids: np.ndarray  # (k, d) coarse quantizer
    codebook: np.ndarray  # (m, ksub, dsub) residual PQ codebook
    encoded: DataFrame  # id, cluster, pq_codes (+ vec col if kept)
    id_col: str
    vec_col: str


def with_residuals(
    assigned: DataFrame, centroids: np.ndarray, vec_col: str
) -> DataFrame:
    """Attach the JVM-side residual column (vector minus its assigned
    centroid) — ONE definition shared by index build and incremental
    append, so the encode convention cannot drift between them (the
    byte-for-byte determinism tests rely on that agreement)."""
    cent_lit = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in row])
            for row in centroids
        ]
    )
    return assigned.withColumn(
        "_residual",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.element_at(cent_lit, F.col("cluster") + 1),
            lambda x, c: x - c,
        ),
    )


def build_ivfpq(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    max_iter: int = 4,
    coarse_iter: int = 6,
    keep_vectors: bool = True,
) -> IvfPqIndex:
    """Coarse-assign, compute residuals (JVM-side), train the residual
    codebook, encode.  ``keep_vectors=False`` drops the raw vectors from
    the encoded frame (the serving layout: 8-byte codes only).

    The coarse quantizer is this repo's deterministic ``ext.kmeans``
    (max-cosine assignment, seed centroids = k smallest ids), so the whole
    index — clusters AND codes — is reproducible byte-for-byte under any
    input partitioning (pinned in tests/test_ivfpq.py)."""
    from tulflow_spark.ext.kmeans import assign_clusters, kmeans_fit

    centroids = np.asarray(
        kmeans_fit(
            df, id_col=id_col, vec_col=vec_col, k=n_clusters,
            max_iter=coarse_iter,
        ),
        dtype=np.float64,
    )
    assigned = assign_clusters(
        df.select(id_col, vec_col), centroids.tolist(), vec_col=vec_col
    )
    with_res = with_residuals(assigned, centroids, vec_col)
    codebook = pq_train(
        with_res, id_col=id_col, vec_col="_residual",
        dim=dim, m=m, ksub=ksub, max_iter=max_iter,
    )
    encoded = pq_encode(with_res, codebook, vec_col="_residual").drop(
        "_residual"
    )
    if not keep_vectors:
        encoded = encoded.drop(vec_col)
    return IvfPqIndex(
        centroids=centroids,
        codebook=codebook,
        encoded=encoded,
        id_col=id_col,
        vec_col=vec_col,
    )


def ivfpq_topk(
    index: IvfPqIndex,
    query: Sequence[float],
    k: int = 10,
    n_probes: int = 4,
    rerank: int = 0,
) -> DataFrame:
    """ADC top-k restricted to the ``n_probes`` clusters whose centroids
    are most cosine-similar to the query (the assignment metric — a
    driver-side k×d computation).  Score = q·centroid_cluster +
    Σ_s LUT[s][code_s] (the inner-product ADC decomposition), all JVM
    column algebra."""
    q = np.asarray(list(query), dtype=np.float64)
    cn = index.centroids / np.maximum(
        np.linalg.norm(index.centroids, axis=1, keepdims=True), 1e-12
    )
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    sims = cn @ qn
    probes = [int(i) for i in np.argsort(-sims)[:n_probes]]
    offsets = index.centroids @ q  # (k,) q·centroid_c
    m = index.codebook.shape[0]
    lut = F.array(
        *[
            F.array(*[F.lit(v) for v in row])
            for row in _adc_lut(index.codebook, q)
        ]
    )
    off_lit = F.array(*[F.lit(float(o)) for o in offsets])
    scored = (
        index.encoded.filter(F.col("cluster").isin(probes))
        .withColumn(
            "pq_score",
            F.element_at(off_lit, F.col("cluster") + 1)
            + F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, s: acc
                + F.element_at(
                    F.element_at(lut, s + 1),
                    F.element_at(F.col("pq_codes"), s + 1) + 1,
                ),
            ),
        )
    )
    if not rerank:
        return (
            scored.select(index.id_col, "pq_score")
            .orderBy(F.col("pq_score").desc(), F.col(index.id_col))
            .limit(k)
        )
    if index.vec_col not in index.encoded.columns:
        raise ValueError(
            "index stores no raw vectors (built with keep_vectors=False "
            "or loaded via load_ivfpq); rerank against the source table "
            "or pass rerank=0"
        )
    from tulflow_spark.ext.similarity import cosine

    qcol = F.array(*[F.lit(float(x)) for x in q])
    cands = (
        scored.orderBy(F.col("pq_score").desc(), F.col(index.id_col))
        .limit(rerank)
        .withColumn("cosine_sim", cosine(F.col(index.vec_col), qcol))
    )
    return (
        cands.select(index.id_col, "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(index.id_col))
        .limit(k)
    )


__all__ = ["IvfPqIndex", "build_ivfpq", "ivfpq_topk"]
