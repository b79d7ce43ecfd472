"""Connected components (ext.components): exactness against a union-find
reference on adversarial shapes, and the curation semantics built on it."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tulflow_spark.ext.components import assign_components, connected_components


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_chain_collapses_to_single_min(spark):
    # 0-1-2-...-19: greedy pairwise would already solve this, but the point
    # is the label: everyone maps to 0.
    edges = [(i, i + 1) for i in range(19)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(20)}


def test_local_minimum_is_not_kept(spark):
    # {1,3} and {2,3}: node 2 is a local minimum (never the larger end of
    # a... actually never paired with 1) yet belongs to component 1.
    got = _cc(spark, [(1, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_multiple_components_and_noise(spark):
    edges = [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30), (5, 5)]
    got = _cc(spark, edges)
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


@pytest.mark.parametrize("seed,n,m", [(1, 60, 40), (2, 200, 150), (3, 80, 200)])
def test_random_graphs_match_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [e for e in edges if e[0] != e[1]]
    got = _cc(spark, edges)
    assert got == _union_find(edges)


def test_assign_components_total_coverage(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], ["doc_id", "text"]
    )
    edges = spark.createDataFrame([(1, 3), (2, 3)], ["id_a", "id_b"])
    out = {
        r["doc_id"]: r["component"]
        for r in assign_components(docs, "doc_id", edges).collect()
    }
    # paired docs -> component min; isolated docs -> themselves
    assert out == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 7}


def test_curate_cc_drops_chained_local_minima(spark):
    # Star-shaped cluster: docs 1 and 2 share nothing, but both near-match
    # doc 3 (whose text is their concatenation).  Greedy pairwise drops only
    # id_b of each pair ({3}), keeping BOTH local minima {1, 2}; exact
    # cluster semantics keeps only the component minimum {1}.
    a = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    b = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, a + " " + b)], ["doc_id", "text"]
    )

    from tulflow_spark.ext.curation import curate_near_dup, curate_near_dup_cc
    from tulflow_spark.ext.dedup import minhash_lsh_pairs

    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.3, k=32, bands=32
        ).collect()
    }
    # precondition for the scenario: a star around 3, no 1-2 edge
    assert (1, 3) in pairs and (2, 3) in pairs and (1, 2) not in pairs

    greedy = {
        r["doc_id"]
        for r in curate_near_dup(
            docs, "doc_id", "text", min_quality=0.0, near_dup_threshold=0.3,
            k=32, bands=32,
        ).collect()
    }
    exact = {
        r["doc_id"]
        for r in curate_near_dup_cc(
            docs, "doc_id", "text", min_quality=0.0, near_dup_threshold=0.3,
            k=32, bands=32,
        ).collect()
    }
    assert greedy == {1, 2}
    assert exact == {1}


def test_large_star_needs_no_internal_dedup(spark):
    """r15 optimization pin: _large_star dropped its internal
    dropDuplicates (one full shuffle per round) because its only
    consumer, _small_star, is duplicate-insensitive — the min-aggregate
    ignores multiplicity and the terminal dropDuplicates
    re-canonicalizes the round.  Assert the per-round edge SET equality
    directly on an adversarial dense-plus-chain graph (dense components
    are exactly where the un-deduped output carries duplicates)."""
    from tulflow_spark.ext.components import _large_star, _small_star

    random.seed(7)
    edges = [(a, b) for a in range(12) for b in range(a + 1, 12)]  # clique
    edges += [(i, i + 1) for i in range(20, 40)]                   # chain
    edges += [(random.randrange(50, 70), random.randrange(50, 70))
              for _ in range(60)]                                  # random
    e = (spark.createDataFrame(edges, ["u", "v"])
         .filter(F.col("u") != F.col("v")).dropDuplicates())
    for _ in range(3):
        ls = _large_star(e)
        # the round output through the UN-deduped large-star equals the
        # round output through an explicitly deduped one
        got = {(r["u"], r["v"]) for r in _small_star(ls).collect()}
        want = {(r["u"], r["v"])
                for r in _small_star(ls.dropDuplicates()).collect()}
        assert got == want
        e = spark.createDataFrame(sorted(got), ["u", "v"])
