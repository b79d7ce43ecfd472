"""Mergeable HLL sketches: merge-of-partials must estimate the TRUE global
distinct count (not the sum of per-slice counts), within HLL error bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

from tulflow_spark.ext.sketches import distinct_sketch, merge_sketches
from tulflow_spark.io import table

SF = "/root/testdata/sf0.01"


def test_sketch_merge_estimates_global_distinct(spark):
    ev = table(spark, SF, "events")
    # per-day partials (the storable form)
    daily = distinct_sketch(
        ev.withColumn("day", F.to_date("ts")), ["day"], "user_id"
    )
    assert daily.count() > 1
    # merged estimate over all days vs exact global distinct
    est = merge_sketches(
        daily.withColumn("_all", F.lit(1)), ["_all"]
    ).head().distinct_estimate
    exact = ev.select("user_id").distinct().count()
    # users repeat across days: naive sum of dailies would be ~30x too big;
    # the merge must deduplicate across slices
    naive_sum = merge_sketches(daily, ["day"]).agg(
        F.sum("distinct_estimate")
    ).head()[0]
    assert naive_sum > exact * 2
    assert abs(est - exact) / exact < 0.05


def test_sketch_column_is_storable(spark, tmp_path):
    """Sketches survive a parquet round-trip (binary column) and still merge."""
    ev = table(spark, SF, "events")
    daily = distinct_sketch(
        ev.withColumn("day", F.to_date("ts")), ["day"], "user_id"
    )
    p = str(tmp_path / "sketches")
    daily.write.parquet(p)
    back = spark.read.parquet(p).withColumn("_all", F.lit(1))
    est = merge_sketches(back, ["_all"]).head().distinct_estimate
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_heavy_hitters_exact_vs_plain_groupby(spark):
    """MG-candidates + recount must equal the exact HAVING answer on a
    zipf-ish corpus, regardless of partitioning."""
    import numpy as np

    from tulflow_spark.ext.sketches import heavy_hitters

    rng = np.random.default_rng(5)
    vals = [f"k{int(v)}" for v in rng.zipf(1.3, size=20_000) % 500]
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(13)
    got = {
        (r["tok"], r["cnt"]) for r in heavy_hitters(df, "tok", k=32).collect()
    }
    exact = {
        (r["tok"], r["cnt"])
        for r in df.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 32 > len(vals))
        .collect()
    }
    assert got == exact and exact  # non-trivial answer set


def test_misra_gries_partial_is_bounded_and_superset(spark):
    """Each partition emits ≤ width rows; every true heavy hitter appears in
    the candidate union (the guarantee the recount pass relies on)."""
    from tulflow_spark.ext.sketches import misra_gries_partial

    # 4 partitions, one dominant key + noise
    rows = [("hot",)] * 4000 + [(f"n{i}",) for i in range(4000)]
    df = spark.createDataFrame(rows, "tok string").repartition(4)
    width = 16
    sk = misra_gries_partial(df, "tok", width=width).collect()
    per_part = {}
    for r in sk:
        per_part[r["tok"]] = per_part.get(r["tok"], 0) + 1
    assert len(sk) <= 4 * width
    assert "hot" in {r["tok"] for r in sk}


def test_heavy_hitters_empty_answer(spark):
    """Uniform data above the threshold cardinality → empty result, no error."""
    from tulflow_spark.ext.sketches import heavy_hitters

    rows = [(f"u{i % 200}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "tok string")
    assert heavy_hitters(df, "tok", k=64).count() == 0


def test_mg_merge_bound_property():
    """Hypothesis property: for any stream and width, MG estimates never
    overcount and undercount at most n/(width+1) — the guarantee the
    candidate-superset argument rests on."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tulflow_spark.ext.sketches import mg_merge_counts

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=30), max_size=300),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=10),
    )
    def prop(stream, width, n_chunks):
        exact = Counter(stream)
        counters: dict = {}
        size = max(1, len(stream) // n_chunks) if stream else 1
        for i in range(0, len(stream), size):
            chunk = Counter(stream[i : i + size])
            counters = mg_merge_counts(counters, chunk.items(), width)
        n = len(stream)
        assert len(counters) <= width
        for v, est in counters.items():
            assert est <= exact[v], "overcount"
        for v, true in exact.items():
            est = counters.get(v, 0)
            assert true - est <= n / (width + 1) + 1e-9, (
                f"undercount bound broken for {v}: {true}-{est} > n/(w+1)"
            )

    prop()
