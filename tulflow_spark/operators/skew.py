"""Skew-resistant aggregation: two-phase salted group-by.

At 100 TB a handful of hot keys (one giant OAI set, one viral document
source) can stall a single reducer.  Salting splits each key's rows across
``buckets`` partial groups (phase 1, map-side + small shuffle), then merges
the partials (phase 2, #keys × buckets rows — tiny).  With decimal-exact
accumulation the result is bit-identical to the unsalted aggregate, so this
is a pure physical rewrite.  (AQE's skew-join splitting covers joins; this
covers aggregations, which AQE does not re-balance.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    buckets: int = 16,
    alias: str = "total",
) -> DataFrame:
    """groupBy(keys).sum(value), executed as salt-partial → merge."""
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets)),
    )
    partials = salted.groupBy(*keys, "_salt").agg(
        F.sum(v.cast(_DEC)).alias("_partial"),
        F.count(F.lit(1)).alias("_n"),
    )
    return partials.groupBy(*keys).agg(
        F.sum("_partial").cast("double").alias(alias),
        F.sum("_n").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side
    across every salt value.

    For when a hot key is too big for one reducer but the other side is too
    large to broadcast: each of the hot key's row groups meets its own copy
    of the matching small-side rows.  Cost: small side × buckets (bounded,
    explicit).  Semantics identical to ``big.join(small, on, how)`` for
    inner/left joins.  AQE's skew-join handles sort-merge skew
    automatically; this is the manual tool for the cases AQE can't re-plan
    (e.g. when the skewed side feeds a co-partitioned downstream op).

    Only joins whose output rows are driven by the (salted) big side are
    legal: right/full/outer would emit each unmatched small-side row once
    PER SALT BUCKET — silently wrong — so they are rejected.  Semi/anti
    are fine (each big row carries exactly one salt; the small side is
    replicated to every salt, so key-match ⇔ salted-match).
    """
    allowed = {
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "semi",
        "left_anti",
        "leftanti",
        "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            f"rows once per salt bucket; use one of {sorted(allowed)}"
        )
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets)),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return big_s.join(small_s, [*on, "_salt"], how).drop("_salt")
