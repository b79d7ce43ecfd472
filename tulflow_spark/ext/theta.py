"""KMV / theta sketches — mergeable distinct-count AND set-overlap
estimation (Bar-Yossef et al. 2002; the DataSketches theta family):
keep the k minimum values of a uniform hash; the k-th smallest,
``theta``, estimates density, and because sketches over the SAME hash
are comparable, two sketches INTERSECT — the estimator a7's HLL cannot
provide (HLL unions losslessly but has no sound intersection).

Where a pipeline needs this: contamination overlap between two corpora
("how many benchmark documents leaked into the crawl?"), audience /
domain overlap, dedup-rate forecasting before running the dedup —
each at 100 TB where exact distinct-intersections are a full shuffle of
both sides, while sketches are k rows per group.

Estimators (standard KMV algebra, exact below k):

- cardinality: ``(k - 1) / theta_k`` when the set kept ``k`` hashes,
  else the exact kept count;
- intersection of A and B: ``theta = min(theta_A, theta_B)``; the kept
  hashes below ``theta`` present in BOTH sketches, divided by
  ``theta``;
- union: merge the kept sets, keep the k smallest.

DETERMINISM is the design choice (the repo's md5 idiom,
`ext/mixing.py`): the hash is the first 15 hex chars of
``md5(cast(value as string))`` scaled to (0, 1] — identically
computable in Spark, DuckDB, and CPython, so the sketch, theta, and
every estimate are bit-reproducible and the driver gate hash-checks
the ESTIMATES themselves, not just error bounds.

Spark shape: ``kmv_sketch`` = distinct-hash + one bounded window per
group (k rows survive); everything downstream is k-sized — driver-safe
to collect, broadcastable, mergeable.  Reference analog: none; this is
north-star estimation surface beside a7/a9.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: exact in int64 AND in float64-free integer
# algebra on every engine (the repo-wide checksum idiom)
_SCALE = 1 << 60


def kmv_hash(c: Column | str) -> Column:
    """The sketch hash: first 15 hex chars of md5(value) as a 60-bit
    BIGINT in [0, 2^60) — engine-portable and collision-negligible at
    sketch sizes (k <= 2^16 draws from 2^60)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15),
        16, 10,
    ).cast("bigint")


def kmv_hash_sql(expr: str) -> str:
    """The DuckDB-identical mirror of :func:`kmv_hash` (DuckDB's md5
    takes VARCHAR and hashes its UTF-8 bytes — the same bytes Spark's
    md5(cast(string as binary)) hashes)."""
    return (
        "CAST(('0x' || substr(md5(CAST({e} AS VARCHAR)), 1, 15)) "
        "AS BIGINT)"
    ).format(e=expr)


def kmv_sketch(df: DataFrame, group: str, value: str, k: int = 256
               ) -> DataFrame:
    """Per-``group`` KMV sketch of ``value``: the k smallest DISTINCT
    hashes, ranked.  Output: (group, hash, rank) with rank in [1, k] —
    k rows per group, the bounded state every estimator reads.

    Scale shape: one distinct (hash exchange on (group, hash)) + one
    window on the group key; the window input is already distinct
    hashes, and only k rows per group survive.  NULL values are
    excluded (a set membership question has no NULL member)."""
    if k < 2:
        raise ValueError("kmv needs k >= 2 (theta is the k-th minimum)")
    hashed = (
        df.where(F.col(value).isNotNull())
        .select(F.col(group).alias(group), kmv_hash(value).alias("hash"))
        .distinct()
    )
    # two-stage prune: a direct row_number over the group would funnel
    # EVERY distinct hash of a group through one task's sort; pruning
    # per (group, hash-salt) shard first bounds that task's input to
    # its shard, and only shards x k rows reach the final window
    shard = F.pmod(F.col("hash"), F.lit(64))
    w1 = Window.partitionBy(group, shard).orderBy("hash")
    w2 = Window.partitionBy(group).orderBy("hash")
    return (
        hashed.withColumn("rank", F.row_number().over(w1))
        .where(F.col("rank") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )


def kmv_estimate(sk: DataFrame, group: str, k: int = 256) -> DataFrame:
    """Distinct-count estimate per group from a :func:`kmv_sketch`:
    exact kept-count below k, else ``(k-1) / theta`` with theta =
    (k-th smallest hash + 1) / 2^60.  Integer-exact arithmetic: the
    estimate is FLOOR((k-1) * 2^60 / (hash_k + 1)) — reproducible
    bit-for-bit in SQL."""
    agg = sk.groupBy(group).agg(
        F.count(F.lit(1)).alias("kept"),
        F.max(F.when(F.col("rank") == k, F.col("hash"))).alias("hash_k"),
    )
    est = F.when(
        F.col("kept") < k, F.col("kept").cast("bigint")
    ).otherwise(
        # floor((k-1) * 2^60 / (hash_k + 1)) — integral `div`, exact in
        # decimal, no float in sight (the repo's scaled-int recipe);
        # decimal division would ROUND at its result scale
        F.call_function(
            "div",
            # (k-1) * 2^60 exceeds int64 — a decimal literal, not lit()
            F.expr(f"CAST('{(k - 1) * _SCALE}' AS DECIMAL(38,0))"),
            (F.col("hash_k") + 1).cast("decimal(38,0)"),
        ).cast("bigint")
    )
    return agg.select(group, est.alias("estimate"),
                      F.col("kept").cast("bigint").alias("kept"))


def kmv_union(sk_a: DataFrame, sk_b: DataFrame, group: str,
              k: int = 256, *, built_k: int | None = None) -> DataFrame:
    """Merged sketch per group: KMV(A ∪ B) — an EXACT sketch identity,
    not an approximation of one: the k smallest hashes of A ∪ B are all
    contained in (k smallest of A) ∪ (k smallest of B), so re-ranking
    the unioned kept sets reproduces the sketch a single pass over the
    concatenated data would build (pinned by test).  Input frames are
    k-bounded per group, so the re-rank window sorts ≤ 2k rows per
    group.

    ``k`` must be ≤ the k the input sketches were BUILT with: a larger
    union k would leave kept < k for groups the inputs truncated, which
    :func:`kmv_estimate` then reads as an exact count — a silently
    wrong estimate, not a coarser one.  Pass ``built_k`` (the
    construction k) to have that checked."""
    if built_k is not None and k > built_k:
        raise ValueError(
            f"kmv_union k={k} exceeds the sketch-construction "
            f"k={built_k}: merged groups would under-fill and "
            "kmv_estimate would misread them as exact counts"
        )
    merged = (
        sk_a.select(group, "hash")
        .unionAll(sk_b.select(group, "hash"))
        .distinct()
    )
    w = Window.partitionBy(group).orderBy("hash")
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def kmv_intersect(sk_a: DataFrame, sk_b: DataFrame, k: int = 256
                  ) -> DataFrame:
    """Intersection-cardinality estimate of two single-set sketches
    (frames of (hash, rank) as produced by :func:`kmv_sketch` for one
    group, or any k-row sketch): theta = min(theta_a, theta_b) where a
    sketch that kept < k hashes saw its whole set (theta = 1); the
    matching hashes below theta scale by 1/theta.  One row:
    (n_common, estimate).  Exact when both sets fit below k."""
    # sketches are k-row frames but their LINEAGE is the full corpus
    # pass — cache so the theta job and the overlap join each read k
    # rows instead of re-exploding the corpus per job
    a = sk_a.select("hash", "rank").cache()
    b = sk_b.select("hash", "rank").cache()
    try:
        # both thetas in ONE job: (hash_k + 1) when the sketch is full,
        # else 2^60 (theta = 1: the sketch saw its whole set)
        tagged = a.withColumn("side", F.lit("a")).unionAll(
            b.withColumn("side", F.lit("b"))
        )
        trow = tagged.groupBy("side").agg(
            F.coalesce(
                F.max(F.when(F.col("rank") == k, F.col("hash") + 1)),
                F.lit(_SCALE),
            ).cast("bigint").alias("theta")
        ).collect()
        sides = {r["side"]: int(r["theta"]) for r in trow}
        theta = min(sides.get("a", _SCALE), sides.get("b", _SCALE))
        common = (
            a.select("hash").where(F.col("hash") < theta)
            .join(b.select("hash").where(F.col("hash") < theta), "hash")
            .count()
        )
    finally:
        a.unpersist()
        b.unpersist()
    est = common * _SCALE // theta
    return sk_a.sparkSession.createDataFrame(
        [(int(common), int(est))], "n_common bigint, estimate bigint"
    )


__all__ = [
    "kmv_estimate",
    "kmv_hash",
    "kmv_hash_sql",
    "kmv_intersect",
    "kmv_sketch",
    "kmv_union",
]
