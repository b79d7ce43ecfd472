"""Bucketed co-located joins: same-bucketed fact tables must join with NO
shuffle exchange — the write-once/join-many layout for 100 TB fact joins."""

from __future__ import annotations

import pytest

from tulflow_spark.io import table
from tulflow_spark.io_bucketing import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    write_bucketed(
        table(spark, SF, "lineitem"), "li_b", "l_orderkey", 8,
        path=str(warehouse / "li_b"),
    )
    write_bucketed(
        table(spark, SF, "orders"), "o_b", "o_orderkey", 8,
        path=str(warehouse / "o_b"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li, o = read_table(spark, "li_b"), read_table(spark, "o_b")
    # force sort-merge (tiny test tables would otherwise broadcast; at real
    # fact-fact scale the planner picks SMJ itself)
    joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: a sort-merge join with ZERO shuffle exchanges
    assert "SortMergeJoin" in plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    assert "Bucketed: true" in plan
    # and it is still correct
    assert joined.count() == 6000


def test_bucketed_agg_has_no_shuffle(spark, bucketed):
    import pyspark.sql.functions as F

    li = read_table(spark, "li_b")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    expected = table(spark, SF, "lineitem").select("l_orderkey").distinct().count()
    assert agg.count() == expected


def test_dynamic_partition_pruning_on_dim_filter(spark, tmp_path):
    """DPP: a filter that lives on the DIMENSION side prunes the fact
    table's partition directories at runtime (the partition filter is a
    dynamicpruning subquery in the scan) — the mechanism that lets a
    100 TB date-partitioned fact read only the partitions a dim filter
    selects."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "orders_part")
    spark.range(50_000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 5).alias("prio"),
    ).write.partitionBy("prio").parquet(d)
    fact = spark.read.parquet(d)
    dim = spark.range(5).select(
        F.col("id").alias("prio"),
        F.when(F.col("id") == 3, "HOT").otherwise("cold").alias("name"),
    )
    j = fact.join(dim, "prio").filter(F.col("name") == "HOT")
    assert j.count() == 10_000  # exactly the one partition's rows
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:600]


def test_runtime_bloom_filter_injected_for_selective_join(spark, sf_dir):
    """Engine-native runtime filtering (the third leg beside AQE skew
    split and DPP): a selective build side injects a bloom_filter_agg on
    the probe side's join key, pre-filtering the big scan before the
    shuffle.  At 100 TB the default thresholds (creation side <= 10 MB
    post-filter, application side >= 10 GB scan) activate this
    automatically; the test lowers the application threshold because the
    test corpus is tiny."""
    from pyspark.sql import functions as F

    from tulflow_spark.io import table

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold", "0",
        )
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_custkey") % 997 == 0)
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)\
             .groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower() or "BloomFilter" in plan
        # and the filtered result is still correct
        rows = j.collect()
        assert all(r["count"] >= 0 for r in rows)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold"
        )
