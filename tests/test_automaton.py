"""ext/automaton.py: Aho-Corasick multi-pattern matching.

Golden strategy: every automaton result is checked against an
INDEPENDENT naive scanner (per-pattern sliding window) on both the
classic textbook cases and randomized corpora — the naive scan is
obviously correct, the automaton must agree exactly."""

from __future__ import annotations

import random

import pytest

from tulflow_spark.ext.automaton import Automaton


def naive_counts(text: str, patterns: list[str]) -> list[int]:
    return [
        sum(1 for i in range(len(text) - len(p) + 1)
            if text[i : i + len(p)] == p)
        for p in patterns
    ]


def test_classic_aho_corasick_example():
    # the 1975 paper's canonical set: overlapping + nested outputs
    pats = ["he", "she", "his", "hers"]
    a = Automaton(pats)
    text = "ushers"
    got = sorted(a.iter_matches(text))
    # 'she' ends at 4, 'he' ends at 4 (nested), 'hers' ends at 6
    assert got == [(4, 0), (4, 1), (6, 3)]
    assert a.count_matches(text) == naive_counts(text, pats)


def test_overlapping_and_repeated():
    pats = ["aba", "ba", "a"]
    a = Automaton(pats)
    text = "ababa"
    assert a.count_matches(text) == naive_counts(text, pats) == [2, 2, 3]


def test_failure_links_cross_branches():
    pats = ["abcd", "bcde", "cdef"]
    a = Automaton(pats)
    text = "zabcdefz"
    assert a.count_matches(text) == [1, 1, 1]


def test_unicode_and_no_match():
    a = Automaton(["héllo", "中文"])
    assert a.count_matches("say héllo to 中文 héllo") == [2, 1]
    assert a.count_matches("nothing here") == [0, 0]
    assert a.count_matches("") == [0, 0]


def test_duplicate_patterns_deduped_and_walls():
    a = Automaton(["x", "x", "y"])
    assert a.patterns == ["x", "y"]
    with pytest.raises(ValueError, match="at least one"):
        Automaton([])
    with pytest.raises(ValueError, match="empty pattern"):
        Automaton(["ok", ""])


def test_randomized_agreement_with_naive():
    rng = random.Random(9)
    alphabet = "abc"
    for _ in range(25):
        pats = list({
            "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 4)))
            for _ in range(rng.randint(1, 8))
        })
        text = "".join(rng.choice(alphabet) for _ in range(300))
        a = Automaton(pats)
        assert a.count_matches(text) == naive_counts(text, pats)


def test_mask_union_of_spans():
    a = Automaton(["he", "she", "hers"])
    assert a.mask("ushers!") == "u*****!"
    assert a.mask("clean text") == "clean text"
    assert len(a.mask("ushers")) == len("ushers")
    with pytest.raises(ValueError, match="single"):
        a.mask("x", mask_char="**")


def test_spark_udfs(spark):
    from pyspark.sql import functions as F

    from tulflow_spark.ext.automaton import (
        blocklist_hits_udf,
        mask_blocklist_udf,
    )

    pats = ["bad", "worse", "dre"]
    rows = [(0, "bad baddream"), (1, "clean"), (2, None),
            (3, "worse bad")]
    df = spark.createDataFrame(rows, "i int, t string")
    hits = blocklist_hits_udf(pats)
    mask = mask_blocklist_udf(pats)
    out = (
        df.withColumn("h", hits("t"))
        .select("i", "h.total_hits", "h.distinct_patterns",
                mask("t").alias("masked"))
        .orderBy("i")
        .collect()
    )
    # 'bad baddream': bad x2, dre x1 -> 3 hits, 2 patterns
    assert (out[0]["total_hits"], out[0]["distinct_patterns"]) == (3, 2)
    assert out[0]["masked"] == "*** ******am"
    assert (out[1]["total_hits"], out[1]["distinct_patterns"]) == (0, 0)
    assert out[2]["total_hits"] is None and out[2]["masked"] is None
    assert out[3]["total_hits"] == 2
