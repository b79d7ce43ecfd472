"""K-means clustering over embedding columns + SemDeDup-style semantic dedup.

LLM-pipeline extension (no reference analogue — ``tulflow`` has no vector
operations; cf. ``/root/reference/tulflow/process.py`` which is all XML/S3
helpers).  Public-knowledge algorithms: Lloyd's k-means iterations and the
cluster-then-dedup-within-cluster recipe of SemDeDup (Abbas et al. 2023,
arXiv:2303.09540) / DataComp-style semantic filtering.

Scale shape (100 TB, 1000 executors):

- **fit** — per iteration: one *map-only* assignment pass (iterator pandas
  UDF, a single numpy matmul per Arrow batch; the k×d model rides along in
  the UDF closure, i.e. a broadcast) plus one (cluster, dim)-keyed mean.
  The mean is a plain ``groupBy`` → Spark plans map-side partial aggregates,
  so shuffle volume is bounded by ``n_partitions × k × d`` tiny rows —
  **the embedding vectors themselves never shuffle during fit**.  Driver
  state is the k×d centroid matrix (the model), nothing data-sized.
- **assignment / dedup** — the cluster id becomes a blocking key exactly
  like the sign-LSH bucket in :mod:`tulflow_spark.ext.similarity`: the
  quadratic candidate space of semantic dedup is bounded per cluster
  (``k`` ≈ √n-ish in practice; SemDeDup uses k in the tens of thousands at
  corpus scale so clusters stay ~10³–10⁴ docs), and per-row norms are
  computed once before the pair join, not per pair.

Parity: ``exact_parity=True`` routes every dot product through the
scaled-integer helpers (:func:`similarity.cosine_scaled` — exact,
associative, order-insensitive BIGINT sums), so cluster assignment and the
within-cluster cosine threshold are bit-identical to the DuckDB oracle
regardless of partitioning.  Argmax ties break toward the smallest centroid
index on both engines.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

import math

from tulflow_spark.ext.similarity import SCALE, dot_scaled, norm_sq_scaled

Centroids = Sequence[Sequence[float]]


def seed_centroids(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = 8
) -> list[list[float]]:
    """Deterministic seeds: the vectors of the ``k`` smallest ids.

    Oracle-expressible (``ORDER BY id LIMIT k``) and stable across runs and
    partitionings — unlike k-means++ sampling, which would make every
    downstream gate seed-dependent.  ``head(k)`` moves k vectors (model
    bootstrap), not data.
    """
    rows = df.select(id_col, vec_col).orderBy(id_col).head(k)
    if len(rows) < k:
        raise ValueError(f"need at least k={k} rows to seed, got {len(rows)}")
    return [[float(x) for x in r[1]] for r in rows]


def _lit_vec(c: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in c])


def assign_clusters(
    df: DataFrame,
    centroids: Centroids,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    sim_col: str | None = None,
    exact_parity: bool = False,
) -> DataFrame:
    """Nearest-centroid (max-cosine) assignment; ties → smallest index.

    Production path: iterator pandas UDF, one ``(batch × d) @ (d × k)``
    numpy matmul per Arrow batch against unit-normalized centroids — the
    same legitimate-Python shape as :func:`similarity.signature_buckets`.
    Parity path: k scaled-integer cosine columns folded with ``array_max``
    over ``struct(cos, -index)`` (max cosine, then smallest index) — pure
    column algebra, hash-identical to the DuckDB oracle.
    """
    k = len(centroids)
    if k == 0:
        raise ValueError("centroids must be non-empty")
    if exact_parity:
        # the row norm is computed ONCE (not per centroid) and centroid
        # norms are folded to literals driver-side with the identical IEEE
        # arithmetic (floor(x*x*SCALE) summed as exact ints) — k+1 array
        # reductions in the plan instead of 3k, which is what keeps the
        # codegen tree (and its compile time) linear in k
        def _scaled_norm(c: Sequence[float]) -> int:
            return sum(int(math.floor(float(x) * float(x) * float(SCALE))) for x in c)

        # zero-norm guard mirrors the numpy path (norms==0 → 1.0): a
        # zero vector or zero centroid must yield cos=0, not NULL, so
        # the two assignment paths agree on degenerate inputs
        vn_raw = F.sqrt(norm_sq_scaled(F.col(vec_col)).cast("double"))
        vn = F.when(vn_raw == 0.0, F.lit(1.0)).otherwise(vn_raw)
        packed = F.array_max(
            F.array(
                *[
                    F.struct(
                        (
                            dot_scaled(F.col(vec_col), _lit_vec(c))
                            / (vn * F.lit(math.sqrt(float(_scaled_norm(c))) or 1.0))
                        ).alias("cos"),
                        F.lit(-j).alias("negj"),
                    )
                    for j, c in enumerate(centroids)
                ]
            )
        )
        out = df.withColumn("_best", packed).withColumn(
            out_col, (-F.col("_best.negj")).cast("int")
        )
        if sim_col is not None:
            out = out.withColumn(sim_col, F.col("_best.cos"))
        return out.drop("_best")

    cmat = np.asarray(centroids, dtype=np.float64)  # (k, d)
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0.0] = 1.0
    cunit = cmat / cnorm[:, None]

    @pandas_udf("struct<cluster:int,centroid_sim:double>")
    def nearest(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for v in batches:
            mat = np.vstack(v.to_numpy()).astype(np.float64)  # (b, d)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0.0] = 1.0
            sims = (mat / norms[:, None]) @ cunit.T  # (b, k)
            # argmax returns the FIRST max → smallest index on ties,
            # matching the parity path's struct ordering
            idx = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "cluster": idx.astype(np.int32),
                    "centroid_sim": sims[np.arange(len(idx)), idx],
                }
            )

    out = df.withColumn("_best", nearest(F.col(vec_col))).withColumn(
        out_col, F.col("_best.cluster")
    )
    if sim_col is not None:
        out = out.withColumn(sim_col, F.col("_best.centroid_sim"))
    return out.drop("_best")


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    centroids: Centroids | None = None,
) -> list[list[float]]:
    """Lloyd's iterations; returns the k×d centroid list (the model).

    Per iteration: assignment (map-only, see :func:`assign_clusters`) then a
    (cluster, dim) mean via ``posexplode`` + ``groupBy().avg()`` — partial
    aggregation bounds shuffle rows at ``partitions × k × d``; the k×d
    result is collected to the driver because it IS the model, the only
    driver-side state.  Empty clusters keep their previous centroid (the
    standard Lloyd fallback).  Stops when the max centroid L2 shift < tol.
    """
    base = df.select(id_col, vec_col)
    cmat = np.asarray(
        centroids if centroids is not None else seed_centroids(base, id_col, vec_col, k),
        dtype=np.float64,
    )
    k = len(cmat)
    for _ in range(max_iter):
        assigned = assign_clusters(base, cmat.tolist(), vec_col=vec_col)
        rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = cmat.copy()
        for r in rows:
            new[r["cluster"], r["pos"]] = r["m"]
        shift = float(np.sqrt(((new - cmat) ** 2).sum(axis=1)).max())
        cmat = new
        if shift < tol:
            break
    return cmat.tolist()


def semantic_dedup_pairs(
    df: DataFrame,
    centroids: Centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    exact_parity: bool = False,
) -> DataFrame:
    """Within-cluster near-duplicate pairs (id_a < id_b, cosine ≥ threshold).

    The cluster id is the blocking key — same bounded-quadratic shape as
    :func:`similarity.blocked_near_dup_pairs`, which this reuses (per-row
    norms precomputed before the pair join)."""
    from tulflow_spark.ext.similarity import blocked_near_dup_pairs

    assigned = assign_clusters(
        df.select(id_col, vec_col),
        centroids,
        vec_col=vec_col,
        exact_parity=exact_parity,
    )
    return blocked_near_dup_pairs(
        assigned,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cluster",
        threshold=threshold,
        exact_parity=exact_parity,
    )


def auto_k(n_rows: int, target_block: int = 256, k_min: int = 8) -> int:
    """Scale-aware cluster count: k = ceil(n / target_block).

    The SemDeDup pair join is quadratic WITHIN each cluster, so a fixed k
    makes cost grow as (n/k)² — the round-5 sf1 probe measured 71× wall
    time for 10× rows at k=8.  Holding the mean block size constant
    instead keeps per-block work flat and total candidate pairs linear in
    n (n/target_block blocks × target_block²/2); the fit itself is
    map-only and stays linear because the model is k×d in the closure."""
    return max(k_min, -(-n_rows // target_block))


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = 8,
    threshold: float = 0.4,
    max_iter: int = 10,
    centroids: Centroids | None = None,
    exact_parity: bool = False,
    target_block: int = 256,
) -> DataFrame:
    """SemDeDup: cluster, then drop every vector that has a same-cluster
    neighbor with a SMALLER id at cosine ≥ threshold (first-occurrence-wins,
    the same greedy keeper rule as ``curation.curate_near_dup``).

    Returns the surviving rows of ``df`` plus their ``cluster`` column.
    Passing ``centroids`` skips the fit (and is what the oracle pair does,
    pinning assignment+pair+survivor semantics; the iterative fit is
    pytest-covered instead — it is model training, not a query).

    ``k=None`` picks :func:`auto_k` from a count — the 100 TB default: a
    PINNED k is a scale bug (within-cluster pair cost grows (n/k)²; the
    sf1 probe measured 71× time for 10× rows at k=8, vs ~linear with the
    mean block size held at ``target_block``).

    At 100 TB: the assigned frame feeds three plan branches (both pair-join
    sides + the survivor anti-join), so it is materialized ONCE here
    (``localCheckpoint``) — the same encode-once pattern as
    :mod:`tulflow_spark.ext.pq`; a production deployment would write the
    (id, cluster) columns as a bucketed table keyed on ``cluster``.
    (Measured r15: the parity path's interpreted argmax re-evaluated per
    consumer cost ~17% of the query warm — the ss9 shape; the checkpoint
    blocks are assignment-sized, id + vector + cluster.)

    localCheckpoint trade-off (r15 ADVICE, same terms as
    ``ext.components``): the blocks are NOT lineage-recoverable — an
    executor loss while the returned frame is still in use fails the job
    instead of recomputing — and they live until driver GC drops the
    frame (``catalog.clearCache()`` does not free them).  Callers that
    manage their own materialization can pass ``centroids`` and build the
    assignment with :func:`assign_clusters` directly.
    """
    from tulflow_spark.ext.similarity import blocked_near_dup_pairs

    if centroids is None:
        if k is None:
            k = auto_k(df.count(), target_block)
        centroids = kmeans_fit(
            df, id_col=id_col, vec_col=vec_col, k=k, max_iter=max_iter
        )
    assigned = assign_clusters(
        df, centroids, vec_col=vec_col, exact_parity=exact_parity
    ).localCheckpoint()
    # one assignment pass feeds both the pair join and the survivor output
    pairs = blocked_near_dup_pairs(
        assigned,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cluster",
        threshold=threshold,
        exact_parity=exact_parity,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.join(dropped, id_col, "left_anti")


def cluster_summary(
    df: DataFrame,
    centroids: Centroids,
    vec_col: str = "embedding",
    exact_parity: bool = False,
) -> DataFrame:
    """Per-cluster size and mean cosine-to-centroid — the fit-quality
    diagnostic (map-side-combinable aggregate over the assignment pass)."""
    assigned = assign_clusters(
        df,
        centroids,
        vec_col=vec_col,
        sim_col="centroid_sim",
        exact_parity=exact_parity,
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("centroid_sim").alias("mean_sim"),
    )


def production_assignment(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 5,
) -> DataFrame:
    """Fit + assign with the production (numpy) path — the rows-only demo
    query; its agreement with the parity path is pinned by pytest."""
    model = kmeans_fit(df, id_col=id_col, vec_col=vec_col, k=k, max_iter=max_iter)
    return assign_clusters(
        df.select(id_col, vec_col), model, vec_col=vec_col, sim_col="centroid_sim"
    ).select(id_col, "cluster", F.round("centroid_sim", 6).alias("centroid_sim"))


__all__ = [
    "seed_centroids",
    "assign_clusters",
    "kmeans_fit",
    "semantic_dedup_pairs",
    "semantic_dedup",
    "cluster_summary",
    "production_assignment",
]
