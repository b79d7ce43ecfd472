"""Dedup internals: fast-path implementations must agree with their
reference column expressions; shingle construction edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F

from tulflow_spark.ext.dedup import (
    simhash64,
    with_simhash,
    word_shingles,
)


def test_simhash_fast_path_matches_column_expr(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "pack my box with jugs"),
         (3, "one"), (4, "the quick brown fox jumped")],
        "id bigint, text string",
    )
    slow = {r.id: r.s for r in df.select("id", simhash64("text").alias("s")).collect()}
    fast = {r._id: r._sig for r in with_simhash(df, "id", "text").collect()}
    assert slow == fast


def test_word_shingles_edges(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("   ",), ("a a a a",)], "t string"
    )
    got = [r.s for r in df.select(word_shingles("t", 3).alias("s")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # fewer tokens than n
    assert got[2] == []  # empty text
    assert got[3] == []  # whitespace only
    assert got[4] == ["a a a"]  # distinct


def test_simhash_pairs_bucket_cap(spark):
    """A hot chunk value (many identical short docs) must not explode into a
    quadratic self-join: buckets wider than max_bucket are dropped, and the
    plan contains no raw join on the chunk value (posting-list pattern)."""
    from tulflow_spark.ext.dedup import simhash_pairs

    rows = [(i, "same short doc") for i in range(1000)]
    rows += [(2000, "alpha beta gamma delta"), (2001, "alpha beta gamma delta")]
    df = spark.createDataFrame(rows, "id bigint, text string")

    out = simhash_pairs(df, "id", "text", max_hamming=3, max_bucket=100)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    # the 1000-identical bucket (499,500 candidate pairs) is capped away;
    # the small genuine near-dup pair survives
    assert (2000, 2001) in pairs
    assert all(a >= 2000 for a, _ in pairs)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
