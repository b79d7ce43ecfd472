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


# ---------------------------------------------------------------------------
# Frequent items: Misra-Gries summaries with an exact verification pass
# ---------------------------------------------------------------------------


def mg_merge_counts(counters: dict, items, width: int) -> dict:
    """Fold ``(value, count)`` pairs into a Misra-Gries summary of at most
    ``width`` counters — the mergeable-summaries reduction (Agarwal et al.,
    PODS'12): add pointwise; when more than ``width`` counters remain,
    subtract the (width+1)-th largest value from all and drop non-positive.
    Shared by the batch sketch and the streaming stateful operator."""
    for v, c in items:
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > width:
        delta = sorted(counters.values(), reverse=True)[width]
        counters = {v: c - delta for v, c in counters.items() if c > delta}
    return counters


def misra_gries_partial(
    df: DataFrame, key_col: str, width: int = 128
) -> DataFrame:
    """Per-partition Misra-Gries summary: ≤ ``width`` (key, counter) rows per
    partition, per-partition undercount ≤ n_p/(width+1).

    Vectorized per Arrow batch — ``value_counts`` first, then the mergeable-
    summaries reduction (Agarwal et al., PODS'12): add counts pointwise and,
    when more than ``width`` counters remain, subtract the (width+1)-th
    largest counter value from all and drop the non-positive.  That merge
    rule preserves the MG error bound, so batches and partitions compose.
    The sketch is the storable partial: at 100 TB you keep one per
    partition/day and answer frequent-item questions over any union of
    slices by merging — no raw-key re-shuffle.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    field = df.schema[key_col]
    out_schema = StructType(
        [StructField(field.name, field.dataType), StructField("mg_count", LongType())]
    )

    def sketch(batches):
        counters: dict = {}
        for pdf in batches:
            counters = mg_merge_counts(
                counters, pdf[key_col].value_counts().items(), width
            )
        yield pd.DataFrame(
            {key_col: list(counters.keys()), "mg_count": list(counters.values())}
        )

    return df.select(key_col).mapInPandas(sketch, out_schema)


def heavy_hitters(
    df: DataFrame, key_col: str, k: int, width: int | None = None
) -> DataFrame:
    """EXACT frequent items (count·k > total) in two bounded passes.

    1. map-only per-partition MG sketches (``width`` defaults to 2k) — the
       union of their keys is a guaranteed candidate superset: any key with
       freq > n/(width+1) keeps a positive counter in ≥1 partition, and the
       answer threshold n/k > n/(2k+1) clears that bar.
    2. exact recount of candidates only — a broadcast semi-join (candidate
       set ≤ partitions × width keys) followed by one (key, count) shuffle
       of candidate rows; the integer filter ``cnt * k > n`` avoids float
       thresholds entirely.

    Memory is MG-bounded even when key cardinality explodes (the case where
    a plain groupBy's map-side hash would spill); the result is exact, not
    an estimate — which is what makes it oracle-gateable.
    """
    width = width or 2 * k
    cands = misra_gries_partial(df, key_col, width).select(key_col).distinct()
    counted = (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        counted.join(F.broadcast(totals))
        .filter(F.col("cnt") * k > F.col("_n"))
        .select(key_col, "cnt")
    )
