"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **brute-force top-k** (baseline, exact): score every row against the query
  vector with JVM array algebra — a map-only pass + a k-row reduce.  At
  100 TB this is a full scan but embarrassingly parallel and shuffle-free
  except for the final top-k (partial top-k per partition via AQE).
- **sign-LSH bucketed** (scale path): random-hyperplane signatures computed
  by a vectorized pandas UDF (one numpy matmul per Arrow batch), candidates
  from matching signature prefixes, exact re-rank within buckets only.

Parity note: the ``*_scaled`` helpers accumulate floor(x*y*1e12) as BIGINT —
exact, associative, order-insensitive — so Spark results hash-match the
DuckDB oracle bit-for-bit regardless of partitioning.  The plain ``cosine``
helper is the production double-precision path.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SCALE = 1_000_000_000_000  # 1e12: fits 64-dim unit-ish vectors in BIGINT


def _pairwise_scaled(a: Column, b: Column) -> Column:
    """Sum of floor(a_i*b_i*SCALE) as BIGINT (exact, order-insensitive)."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(float(SCALE))).cast(
            "long"
        ),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def dot_scaled(a: Column, b: Column) -> Column:
    return _pairwise_scaled(a, b)


def norm_sq_scaled(a: Column) -> Column:
    return _pairwise_scaled(a, a)


def cosine_scaled(a: Column, b: Column) -> Column:
    """Cosine from scaled-integer dot/norms; deterministic across engines."""
    return dot_scaled(a, b) / (
        F.sqrt(norm_sq_scaled(a).cast("double"))
        * F.sqrt(norm_sq_scaled(b).cast("double"))
    )


def dot(a: Column, b: Column) -> Column:
    """Production double-precision dot product (JVM array algebra)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def query_vector(df: DataFrame, id_col: str, vec_col: str, vec_id) -> list[float]:
    """Fetch one query vector to the driver (a query *parameter*, like the
    reference fetching a rule file — not a data-plane collect)."""
    row = df.filter(F.col(id_col) == vec_id).select(vec_col).head()
    if row is None:
        raise KeyError(f"no vector with {id_col}={vec_id}")
    return list(row[0])


def brute_force_topk(
    df: DataFrame,
    vec: Iterable[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exact_parity: bool = False,
) -> DataFrame:
    """Exact top-k by cosine against a constant query vector.

    Map-only scoring; `orderBy().limit(k)` lets Spark do per-partition
    partial top-k + a k-row final reduce (TakeOrderedAndProject), so nothing
    resembling a global sort happens at scale.
    """
    qcol = F.array(*[F.lit(float(x)) for x in vec])
    sim = cosine_scaled if exact_parity else cosine
    return (
        df.select(
            F.col(id_col),
            sim(F.col(vec_col), qcol).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def blocked_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.4,
    exact_parity: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs within blocks (id_a < id_b,
    cosine >= threshold).  Blocking bounds the quadratic self-join; at scale
    the block column is an LSH bucket id (see ``signature_buckets``).

    Norms are precomputed per ROW before the join (one norm per vector, not
    one per pair — 3× less array math on the quadratic side)."""
    # no io.widen: the expensive pair compute runs AFTER the block join's
    # own shuffle (already at shuffle-partition width); widening the input
    # would just add an exchange of the embedding arrays
    norm_sq = norm_sq_scaled if exact_parity else (lambda v: dot(v, v))
    dot_fn = dot_scaled if exact_parity else dot
    with_norm = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm_sq(F.col(vec_col)).cast("double").alias("_nn"),
    )
    a = with_norm.select(
        F.col("_blk"), F.col("_id").alias("id_a"),
        F.col("_v").alias("_va"), F.col("_nn").alias("_nna"),
    )
    b = with_norm.select(
        F.col("_blk"), F.col("_id").alias("id_b"),
        F.col("_v").alias("_vb"), F.col("_nn").alias("_nnb"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_sim",
            dot_fn(F.col("_va"), F.col("_vb"))
            / (F.sqrt(F.col("_nna")) * F.sqrt(F.col("_nnb"))),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def signature_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Sign-LSH bucket assignment: one vectorized numpy matmul per Arrow
    batch (pandas UDF — the legitimate Python path; ~batch-sized, not
    per-row).  Deterministic planes from the seed.
    """
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("long")
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy())  # (batch, dim)
        signs = mat @ planes > 0  # (batch, n_planes)
        return pd.Series(signs @ weights)

    return df.withColumn(out_col, bucket(F.col(vec_col)))


def lsh_topk(
    df: DataFrame,
    vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only rows whose sign-LSH bucket matches the
    query's — the IVF-style scale path (scan 1/2^n_planes of the data).

    A single AND-bucket has recall ≈ (1−θ/π)^n_planes, which collapses for
    anything but true near-duplicates; prefer :func:`lsh_topk_banded` (OR of
    many bands) when the query's neighbors aren't near-copies.
    """
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    qsig = int(((np.asarray(vec) @ planes > 0) @ weights))

    bucketed = signature_buckets(
        df, vec_col=vec_col, n_planes=n_planes, dim=dim, seed=seed
    )
    qcol = F.array(*[F.lit(float(x)) for x in vec])
    return (
        bucketed.filter(F.col("lsh_bucket") == qsig)
        .select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def banded_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    bands: int = 16,
    rows_per_band: int = 8,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "lsh_buckets",
) -> DataFrame:
    """OR-amplified sign-LSH: ``bands`` encoded bucket ids per vector, one
    per r-plane band (band index packed into the high bits so bucket values
    are globally unique across bands).

    Same amplification construction as MinHash banding: a pair/query-match
    is a candidate if ANY band agrees — P(candidate) = 1−(1−p^r)^B for
    per-plane agreement p = 1−θ/π.  One numpy matmul per Arrow batch for all
    bands at once.  At scale, store this column and explode it into a
    (bucket, id) inverted index, bucketed on write — lookups then touch only
    matching buckets.
    """
    planes = np.random.default_rng(seed).standard_normal(
        (dim, bands * rows_per_band)
    )
    weights = (1 << np.arange(rows_per_band)).astype(np.int64)
    band_base = (np.arange(bands, dtype=np.int64) << rows_per_band)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy())  # (batch, dim)
        signs = (mat @ planes > 0).reshape(len(mat), bands, rows_per_band)
        raw = signs @ weights  # (batch, bands)
        return pd.Series(list(raw | band_base))

    # nondeterministic marker (guide §4.4): a downstream explode makes
    # Catalyst infer a `size(col) > 0` filter below the Generate, and
    # because the column is UDF-computed the inferred filter DUPLICATES
    # the ArrowEvalPython node — every vector crossed the Python
    # boundary and paid the matmul twice (two ArrowEvalPython nodes in
    # the dd5 before-plan, one after).  The function is pure; the
    # marker only stops the optimizer from copying it.
    return df.withColumn(out_col,
                         buckets.asNondeterministic()(F.col(vec_col)))


def _query_band_buckets(
    vec, bands: int, rows_per_band: int, dim: int, seed: int
) -> list[int]:
    planes = np.random.default_rng(seed).standard_normal(
        (dim, bands * rows_per_band)
    )
    weights = (1 << np.arange(rows_per_band)).astype(np.int64)
    signs = (np.asarray(list(vec), dtype=float) @ planes > 0).reshape(
        bands, rows_per_band
    )
    raw = signs @ weights
    return [int(b) for b in raw | (np.arange(bands, dtype=np.int64) << rows_per_band)]


def lsh_topk_banded(
    df: DataFrame,
    vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bands: int = 16,
    rows_per_band: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k over the banded index: exact-rerank only rows
    sharing at least one band bucket with the query."""
    qbuckets = _query_band_buckets(vec, bands, rows_per_band, dim, seed)
    bucketed = banded_buckets(
        df, vec_col=vec_col, bands=bands, rows_per_band=rows_per_band,
        dim=dim, seed=seed,
    )
    qcol = F.array(*[F.lit(float(x)) for x in vec])
    return (
        bucketed.filter(
            F.arrays_overlap(
                F.col("lsh_buckets"), F.array(*[F.lit(b) for b in qbuckets])
            )
        )
        .select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_banded_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    bands: int = 16,
    rows_per_band: int = 6,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding near-dup pairs over the banded index: candidates from any
    shared band bucket (posting-list pair generation, capped per bucket —
    the same skew-safe shape as MinHash/SimHash banding), then exact cosine
    verification on the candidate set only.

    Output: (id_a, id_b, cosine_sim) with id_a < id_b, sim >= threshold.
    """
    from tulflow_spark.ext.dedup import _ordered_pairs

    bucketed = banded_buckets(
        df, vec_col=vec_col, bands=bands, rows_per_band=rows_per_band,
        dim=dim, seed=seed,
    )
    exploded = bucketed.select(
        F.col(id_col).alias("_id"), F.explode("lsh_buckets").alias("_bkt")
    )
    buckets = exploded.groupBy("_bkt").agg(
        F.sort_array(F.collect_list(F.struct(F.col("_id")))).alias("_docs")
    )
    buckets = buckets.filter(
        (F.size("_docs") >= 2) & (F.size("_docs") <= max_bucket)
    )
    candidates = (
        buckets.select(F.explode(_ordered_pairs(F.col("_docs"))).alias("_p"))
        .select(
            F.col("_p.a._id").alias("id_a"), F.col("_p.b._id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])  # a pair can agree on many bands
    )
    # norms once per VECTOR before the join, not once per pair: the
    # candidate set is O(pairs) >> O(vectors), and the higher-order-function
    # array math is interpreted (no codegen) — dropping two of the three
    # per-pair aggregates halves the verify stage (measured 2x at sf0.1)
    va = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        dot(F.col(vec_col), F.col(vec_col)).alias("_nna"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        dot(F.col(vec_col), F.col(vec_col)).alias("_nnb"),
    )
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine_sim",
            dot(F.col("_va"), F.col("_vb"))
            / (F.sqrt(F.col("_nna")) * F.sqrt(F.col("_nnb"))),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
