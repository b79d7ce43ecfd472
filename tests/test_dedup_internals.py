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


def test_dd4_gate_survives_capped_hot_chunk(spark):
    """r3 VERDICT #3: the dd4 equality check compared a CAPPED banded path
    against an UNCAPPED brute-force baseline, so a degenerate hot signature
    chunk flipped the gate even though the cap worked as designed.  The
    cap-aware check must (a) hold as equality on a clean corpus, (b)
    downgrade to subset — and still pass — when a bucket is capped, and
    (c) still fail on a genuine false pair."""
    from tulflow_spark.ext.dedup import (
        simhash_overcap_count,
        simhash_pairs,
    )
    from tulflow_spark.ext.verify import (
        pair_set_equality_or_subset_check,
        simhash_bruteforce_pairs,
    )

    # (a) clean corpus: no cap hit -> equality claim, holds
    clean = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta epsilon"),
         (3, "totally different words here now")],
        "id bigint, text string",
    )
    sig = with_simhash(clean, "id", "text")
    capped = simhash_overcap_count(sig, max_bucket=100)
    assert capped.collect()[0]["n_capped"] == 0
    ok = pair_set_equality_or_subset_check(
        simhash_bruteforce_pairs(clean, "id", "text", sig=sig),
        simhash_pairs(clean, "id", "text", max_bucket=100, sig=sig),
        capped, "dd4",
    ).collect()[0]
    assert ok["ok"] is True

    # (b) degenerate hot chunk: 200 identical docs overflow max_bucket=100;
    # the banded path loses those pairs (recall trade), the brute force
    # keeps them -> equality would fail, subset downgrade must pass
    rows = [(i, "same short doc") for i in range(200)]
    rows += [(500, "alpha beta gamma delta"), (501, "alpha beta gamma delta")]
    hot = spark.createDataFrame(rows, "id bigint, text string")
    hsig = with_simhash(hot, "id", "text")
    hcapped = simhash_overcap_count(hsig, max_bucket=100)
    assert hcapped.collect()[0]["n_capped"] > 0
    ok = pair_set_equality_or_subset_check(
        simhash_bruteforce_pairs(hot, "id", "text", sig=hsig),
        simhash_pairs(hot, "id", "text", max_bucket=100, sig=hsig),
        hcapped, "dd4",
    ).collect()[0]
    assert ok["ok"] is True

    # (c) a false pair (present in approx, absent from exact) must still
    # fail even under the capped downgrade — the cap never excuses
    # precision loss
    bogus = spark.createDataFrame([(900, 901, 0)], "id_a bigint, id_b bigint, hamming int")
    approx_bad = simhash_pairs(
        hot, "id", "text", max_bucket=100, sig=hsig
    ).unionByName(bogus)
    ok = pair_set_equality_or_subset_check(
        simhash_bruteforce_pairs(hot, "id", "text", sig=hsig),
        approx_bad, hcapped, "dd4",
    ).collect()[0]
    assert ok["ok"] is False
