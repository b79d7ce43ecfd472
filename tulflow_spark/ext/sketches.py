"""Mergeable sketch columns (Apache DataSketches via Spark built-ins).

The 100 TB pattern: pre-aggregate per partition/day into SKETCH columns,
store them, and answer distinct-count questions over arbitrary unions of
slices by merging sketches — no re-scan, no exact-distinct shuffle of raw
keys.  This is the incremental form of the reference's pipeline counters
(SURVEY §2.5) when the counted key is high-cardinality (unique records
harvested across months of runs).

All JVM built-ins (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`) — no Python, error ~1.6% at default lgK=12.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    out_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of distinct ``key`` values — the storable,
    mergeable partial."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key), F.lit(lg_k)).alias(out_col)
    )


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Roll sketches up to a coarser grouping and estimate: the no-rescan
    distinct count over any union of stored slices."""
    merged = sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias("_u")
    )
    return merged.select(
        *group_cols, F.hll_sketch_estimate("_u").alias(estimate_col)
    )


def estimate(sketch: Column | str) -> Column:
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(c)
