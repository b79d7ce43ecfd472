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
