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
from typing import Iterator

import numpy as np
import pandas as pd
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


def _codes_exact_udf(cb: list):
    """(m, ksub, dsub) nested float lists → UDF mapping a residual
    array<double> column to the per-subspace argmin codes, using ONLY
    engine-reproducible arithmetic (see the call site in
    ivfpq_topk_seeded): IEEE float64 multiply + floor, exact int64 sums,
    first-min tie-break."""
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(cb, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = mat.shape

    @pandas_udf("array<int>")
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for v in batches:
            vals = v.to_numpy()
            # NULL residuals (a NULL vector upstream) must yield NULL
            # codes, not crash the Arrow batch (r8 review)
            mask = np.array([x is not None for x in vals], dtype=bool)
            out = np.empty(len(vals), dtype=object)
            out[~mask] = None
            if mask.any():
                res = np.vstack(vals[mask]).astype(np.float64)  # (b, d)
                sub = res.reshape(len(res), m, dsub)
                diff = sub[:, :, None, :] - mat[None, :, :, :]
                d2 = np.floor(diff * diff * 1e12).astype(np.int64) \
                    .sum(axis=3)
                codes = d2.argmin(axis=2).astype(np.int32)
                for idx, row in zip(np.nonzero(mask)[0], codes):
                    out[idx] = row
            yield pd.Series(list(out))

    return encode


def ivfpq_topk_seeded(
    df: DataFrame,
    query: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    m: int = 8,
    ksub: int = 16,
    k: int = 10,
    n_probes: int = 4,
    rerank: int = 0,
    coarse: bool = True,
) -> DataFrame:
    """Oracle-expressible IVFADC (the parity variant of build_ivfpq +
    ivfpq_topk, same pipeline shape): seeded coarse quantizer (vectors of
    the ``n_clusters`` smallest ids — ext.kmeans.seed_centroids), parity
    assignment (scaled-int cosine argmax, ties → smallest index), residual
    codebook seeded from the ``ksub`` smallest ids' residuals (zero Lloyd
    iterations), scaled-int ADC with the same q·centroid + Σ LUT[s][code]
    decomposition, exact scaled-int cosine re-rank.

    Every float op is either exact integer algebra (floor(x·y·1e12) summed
    as BIGINT — the ss1/ss5 recipe) or IEEE-deterministic (sqrt, divide),
    so the full index AND scores are hash-reproducible in DuckDB SQL from
    the raw table — this is what makes the driver's gate row for ss9
    rows+schema+hash green instead of rows-only.  The ITERATIVE production
    fit stays :func:`build_ivfpq` (recall floor gated in vr1, determinism
    pinned in tests/test_ivfpq.py).  Returns (id, adc_s BIGINT scaled ADC
    score, cosine_sim rounded 9) with ``rerank > 0``; with ``rerank=0``
    the re-rank stage is skipped and the frame is (id, adc_s) only."""
    import math

    from tulflow_spark.ext.kmeans import (
        _lit_vec,
        assign_clusters,
        seed_centroids,
    )
    from tulflow_spark.ext.similarity import SCALE, cosine_scaled

    q = [float(x) for x in query]
    dim = len(q)
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    if coarse:
        cents = seed_centroids(df, id_col, vec_col, k=n_clusters)
        assigned = assign_clusters(
            df.select(id_col, vec_col), cents, vec_col=vec_col,
            exact_parity=True,
        )
        # materialize the assignment ONCE: the parity argmax is a large
        # interpreted higher-order expression (n_clusters × dim lambda
        # terms), and every downstream reference to `cluster` (the
        # probe filter, the residual element_at, the ADC offset, the
        # re-rank) inlines and RE-EVALUATES it per row — the before-
        # plan's Filter carried the whole 8×64-literal argmax tree.
        # Checkpointing here is the production shape anyway (the built
        # coarse index is what ann_store persists); one assignment
        # evaluation per row, every consumer reads the column.
        assigned = assigned.localCheckpoint(eager=True)
    else:
        # flat PQ (no coarse quantizer): one zero centroid — residuals
        # ARE the raw vectors, offsets are 0, the single cell is probed
        cents = [[0.0] * dim]
        assigned = df.select(id_col, vec_col).withColumn(
            "cluster", F.lit(0)
        )
    cent_lit = F.array(*[_lit_vec(c) for c in cents])
    assigned = assigned.withColumn(
        "_res",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.element_at(cent_lit, F.col("cluster") + 1),
            lambda x, c: x - c,
        ),
    )

    def _idot(a: Sequence[float], b: Sequence[float]) -> int:
        return sum(
            math.floor(float(x) * float(y) * float(SCALE))
            for x, y in zip(a, b)
        )

    def _assign_py(v: Sequence[float]) -> int:
        # bit-identical mirror of assign_clusters(exact_parity=True):
        # exact scaled-int dots, then IEEE sqrt/divide/compare — every op
        # is correctly-rounded in both CPython and the JVM, so the
        # driver-side bootstrap cannot disagree with the engine column
        # (pinned by tests/test_ivfpq.py::test_seeded_parity_matches_engine)
        vn = math.sqrt(float(_idot(v, v))) or 1.0
        best, best_cos = 0, None
        for j, c in enumerate(cents):
            cn = math.sqrt(float(_idot(c, c))) or 1.0
            cos = float(_idot(v, c)) / (vn * cn)
            if best_cos is None or cos > best_cos:
                best, best_cos = j, cos
        return best

    # residual codebook seeds: ksub smallest ids (driver-side model
    # bootstrap — ksub rows off the RAW frame; re-running the parity
    # assignment plan just for them would pay a second Catalyst compile)
    seed_rows = df.select(id_col, vec_col).orderBy(id_col).head(ksub)
    if len(seed_rows) < ksub:
        raise ValueError(f"need >= ksub={ksub} rows to seed the codebook")
    cb: list[list[list[float]]] = [[] for _ in range(m)]
    for row in seed_rows:
        v = [float(x) for x in row[1]]
        c = cents[_assign_py(v)]
        r = [v[i] - float(c[i]) for i in range(dim)]
        for s in range(m):
            cb[s].append(r[s * dsub:(s + 1) * dsub])

    # encode: vectorized Arrow-batched numpy with EXACT arithmetic — the
    # same ops the DuckDB oracle runs, element for element:
    # d2 = Σ_i floor((r_i − c_i)² · 1e12) summed as int64 (float64
    # multiply/floor are IEEE-identical across numpy/JVM/DuckDB; int64
    # sums are exact), ties → first (= smallest) code via argmin.  This
    # is the index BUILD stage, Python by the same precedent as the
    # production pq_encode; the ADC query scan below stays pure JVM.  (A
    # higher-order-function formulation was tried first: interpreted
    # lambda evaluation made encode the bench bottleneck — 2M lambda
    # terms ≈ 5 s at 2k vectors vs milliseconds here.)
    assigned = assigned.withColumn(
        "_codes", _codes_exact_udf(cb)(F.col("_res"))
    )

    # ADC model: LUT + per-cluster offsets, exact ints (mirrored in SQL
    # from the same data-derived codebook)
    lut = [
        [_idot(q[s * dsub:(s + 1) * dsub], cb[s][c]) for c in range(ksub)]
        for s in range(m)
    ]
    offsets = [_idot(q, c) for c in cents]
    qn = math.sqrt(float(_idot(q, q))) or 1.0
    probe_cos = []
    for j, c in enumerate(cents):
        cn = math.sqrt(float(_idot(c, c))) or 1.0
        probe_cos.append(float(offsets[j]) / (qn * cn))
    probes = [
        j for j, _ in sorted(
            enumerate(probe_cos), key=lambda t: (-t[1], t[0])
        )[:n_probes]
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(v).cast("long") for v in row]) for row in lut]
    )
    off_lit = F.array(*[F.lit(o).cast("long") for o in offsets])
    scored = assigned.filter(F.col("cluster").isin(probes)).withColumn(
        "adc_s",
        F.element_at(off_lit, F.col("cluster") + 1)
        + F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.element_at(
                F.element_at(lut_lit, s + 1),
                F.element_at(F.col("_codes"), s + 1) + 1,
            ),
        ),
    )
    if not rerank:
        return (
            scored.select(id_col, "adc_s")
            .orderBy(F.col("adc_s").desc(), F.col(id_col))
            .limit(k)
        )
    qlit = _lit_vec(q)
    return (
        scored.orderBy(F.col("adc_s").desc(), F.col(id_col))
        .limit(rerank)
        .withColumn(
            "cosine_sim",
            F.round(cosine_scaled(F.col(vec_col), qlit), 9),
        )
        .select(id_col, "adc_s", "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


__all__ = ["IvfPqIndex", "build_ivfpq", "ivfpq_topk", "ivfpq_topk_seeded"]
