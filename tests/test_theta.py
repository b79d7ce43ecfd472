"""ext/theta.py: KMV / theta sketches (distinct count + intersection).

Golden strategy: the hash is pinned against CPython's hashlib (the
engine-portability claim), estimators are checked exact below k and
within the KMV error envelope above k, and mergeability/intersection
are verified against exact set algebra on known inputs."""

from __future__ import annotations

import hashlib

import pytest

from tulflow_spark.ext.theta import (
    kmv_estimate,
    kmv_hash,
    kmv_intersect,
    kmv_sketch,
)


def _vals(spark, vals, group="g"):
    return spark.createDataFrame(
        [(group, v) for v in vals], "g string, v string"
    )


def test_hash_pinned_to_hashlib(spark):
    df = _vals(spark, ["42", "héllo", ""])
    got = {r["v"]: r["h"] for r in
           df.select("v", kmv_hash("v").alias("h")).collect()}
    for v in ("42", "héllo", ""):
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def test_exact_below_k(spark):
    df = _vals(spark, [f"v{i}" for i in range(40)] * 3)  # dupes collapse
    est = kmv_estimate(kmv_sketch(df, "g", "v", k=256), "g", k=256)
    row = est.collect()[0]
    assert (row["estimate"], row["kept"]) == (40, 40)


def test_estimate_within_kmv_envelope(spark):
    n, k = 5000, 256
    df = _vals(spark, [f"item-{i}" for i in range(n)])
    row = kmv_estimate(kmv_sketch(df, "g", "v", k=k), "g", k=k).collect()[0]
    assert row["kept"] == k
    # KMV relative std ~ 1/sqrt(k-2) ~ 6.3%; 4 sigma
    assert abs(row["estimate"] - n) < n * 0.25, row["estimate"]


def test_sketch_deterministic_and_null_excluded(spark):
    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b"), ("g", "a")],
        "g string, v string",
    )
    s1 = sorted(r["hash"] for r in kmv_sketch(df, "g", "v").collect())
    s2 = sorted(r["hash"] for r in kmv_sketch(df, "g", "v").collect())
    assert s1 == s2 and len(s1) == 2  # dedup + NULL excluded


def test_intersection_exact_when_small(spark):
    a = kmv_sketch(_vals(spark, [f"x{i}" for i in range(30)]), "g", "v")
    b = kmv_sketch(_vals(spark, [f"x{i}" for i in range(20, 50)]), "g", "v")
    row = kmv_intersect(a, b, k=256).collect()[0]
    assert (row["n_common"], row["estimate"]) == (10, 10)


def test_intersection_estimate_large(spark):
    k = 256
    a = kmv_sketch(
        _vals(spark, [f"i{i}" for i in range(4000)]), "g", "v", k=k)
    b = kmv_sketch(
        _vals(spark, [f"i{i}" for i in range(2000, 6000)]), "g", "v", k=k)
    row = kmv_intersect(a, b, k=k).collect()[0]
    # true overlap 2000; intersection error grows with the union/
    # intersection ratio — allow a wide but meaningful envelope
    assert 1000 < row["estimate"] < 3200, row["estimate"]


def test_k_wall(spark):
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_sketch(_vals(spark, ["a"]), "g", "v", k=1)


def test_per_group_sketches(spark):
    rows = [("a", f"v{i}") for i in range(10)] + \
           [("b", f"w{i}") for i in range(600)]
    df = spark.createDataFrame(rows, "g string, v string")
    est = {r["g"]: r for r in
           kmv_estimate(kmv_sketch(df, "g", "v", k=256), "g",
                        k=256).collect()}
    assert est["a"]["estimate"] == 10
    assert abs(est["b"]["estimate"] - 600) < 150


def test_union_sketch_is_exact_sketch_identity(spark):
    """KMV(A ∪ B) from merged kept sets equals the sketch a single pass
    over the concatenated data builds — exact, not approximate."""
    from tulflow_spark.ext.theta import kmv_union

    k = 64
    a_rows = [f"a{i}" for i in range(300)]
    b_rows = [f"a{i}" for i in range(150, 450)]  # overlaps A
    sk_a = kmv_sketch(_vals(spark, a_rows), "g", "v", k=k)
    sk_b = kmv_sketch(_vals(spark, b_rows), "g", "v", k=k)
    merged = kmv_union(sk_a, sk_b, "g", k=k)
    direct = kmv_sketch(_vals(spark, a_rows + b_rows), "g", "v", k=k)
    got = sorted((r["hash"], r["rank"]) for r in merged.collect())
    want = sorted((r["hash"], r["rank"]) for r in direct.collect())
    assert got == want
    est = kmv_estimate(merged, "g", k=k).collect()[0]["estimate"]
    assert abs(est - 450) < 450 * 0.5  # k=64: wide but sane envelope


def test_union_k_compat_guard(spark):
    """ADVICE r9: union k larger than the construction k yields
    under-filled merged sketches that kmv_estimate misreads as exact
    counts — kmv_union(built_k=) refuses typed."""
    from tulflow_spark.ext.theta import kmv_union

    sk = kmv_sketch(_vals(spark, [f"v{i}" for i in range(600)]),
                    "g", "v", k=16)
    with pytest.raises(ValueError, match="exceeds the sketch-construction"):
        kmv_union(sk, sk, "g", k=64, built_k=16)
    # compatible k passes through unchanged
    merged = kmv_union(sk, sk, "g", k=16, built_k=16)
    assert merged.count() == 16
