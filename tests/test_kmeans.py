"""ext.kmeans: Lloyd's fit, assignment parity, SemDeDup semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tulflow_spark.ext import kmeans


def _blob_df(spark, seed=7, n_per=40, dim=8):
    """Three well-separated blobs on coordinate axes; ids encode the blob
    (id // 1000) so recovery is checkable without alignment search."""
    rng = np.random.default_rng(seed)
    rows = []
    for blob in range(3):
        center = np.zeros(dim)
        center[blob] = 10.0
        pts = center + rng.normal(0, 0.1, size=(n_per, dim))
        for i, p in enumerate(pts):
            rows.append((blob * 1000 + i, [float(x) for x in p]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_fit_recovers_separable_blobs(spark):
    df = _blob_df(spark)
    model = kmeans.kmeans_fit(df, k=3, max_iter=10)
    assigned = kmeans.assign_clusters(df, model).select("vec_id", "cluster")
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    # each blob maps to exactly one cluster and the mapping is a bijection
    blob_to_cluster = {}
    for vid, c in got.items():
        blob = vid // 1000
        assert blob_to_cluster.setdefault(blob, c) == c, (
            f"blob {blob} split across clusters"
        )
    assert len(set(blob_to_cluster.values())) == 3


def test_production_matches_parity_assignment(spark, sf_dir):
    from tulflow_spark.io import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = kmeans.seed_centroids(emb, k=8)
    parity = kmeans.assign_clusters(emb, cents, exact_parity=True)
    prod = kmeans.assign_clusters(emb, cents, exact_parity=False)
    joined = (
        parity.select("vec_id", F.col("cluster").alias("c_parity"))
        .join(prod.select("vec_id", F.col("cluster").alias("c_prod")), "vec_id")
        .collect()
    )
    assert joined, "no rows"
    mismatches = [r for r in joined if r["c_parity"] != r["c_prod"]]
    # scaled-int vs float64 argmax can only disagree on near-exact ties;
    # the synthetic corpus has none
    assert not mismatches, f"{len(mismatches)} assignment disagreements"


def test_parity_assignment_handles_zero_vectors(spark):
    # r4 ADVICE: zero-norm rows/centroids used to divide by zero in the
    # exact_parity path (NULL cosine → undefined assignment) while the
    # numpy path guarded them; both must now agree on degenerate inputs
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    cents = [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    parity = kmeans.assign_clusters(df, cents, exact_parity=True, sim_col="sim")
    prod = kmeans.assign_clusters(df, cents, exact_parity=False, sim_col="sim")
    p = {r["vec_id"]: r for r in parity.collect()}
    q = {r["vec_id"]: r for r in prod.collect()}
    for vid in (0, 1, 2):
        assert p[vid]["cluster"] is not None and p[vid]["sim"] is not None
        assert p[vid]["cluster"] == q[vid]["cluster"], vid
    # zero vector: every cosine is 0 → tie breaks to smallest index
    assert p[0]["cluster"] == 0


def test_semantic_dedup_first_occurrence_wins(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (1, v),
        (2, v),  # exact dup of 1 → dropped
        (3, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 1 → dropped
        (10, w),  # other cluster, survives
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [v, w]
    out = kmeans.semantic_dedup(
        df, centroids=cents, threshold=0.9, exact_parity=True
    )
    survivors = sorted(r["vec_id"] for r in out.collect())
    assert survivors == [1, 10]
    clusters = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert clusters == {1: 0, 10: 1}


def test_auto_k_holds_block_size():
    assert kmeans.auto_k(2_000) == 8  # floor k_min
    assert kmeans.auto_k(20_000) == 79  # ceil(20000/256)
    assert kmeans.auto_k(20_000, target_block=100) == 200
    assert kmeans.auto_k(0) == 8
    # the invariant the sf1 probe relies on: mean block size bounded
    for n in (10_000, 1_000_000, 10_000_000):
        assert n / kmeans.auto_k(n) <= 256


def test_semantic_dedup_auto_k_removes_tiled_neardups(spark):
    # 3 copies of each blob point with tiny noise → ~1 survivor per point;
    # k=None must pick auto_k and still dedup correctly
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, size=(40, 8))
    rows = []
    for c in range(3):
        pts = base + rng.normal(0, 1e-3, size=base.shape)
        for i, p in enumerate(pts):
            rows.append((c * 1000 + i, [float(x) for x in p]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = kmeans.semantic_dedup(
        df, k=None, threshold=0.99, max_iter=3, target_block=16
    )
    ids = [r["vec_id"] for r in kept.select("vec_id").collect()]
    # every base point keeps AT LEAST one representative; near-total dedup
    # of the copies (copies can straddle a cluster boundary, so allow a
    # small remainder rather than exactly 40)
    assert {i % 1000 for i in ids} == set(range(40))
    assert len(ids) <= 48


def test_assignment_tie_breaks_to_smallest_index(spark):
    v = [1.0, 0.0]
    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<float>")
    # identical centroids → cosine ties exactly; both paths must pick index 0
    for parity in (True, False):
        c = (
            kmeans.assign_clusters(df, [v, v], exact_parity=parity)
            .head()["cluster"]
        )
        assert c == 0, f"parity={parity}"


def test_empty_cluster_keeps_seed(spark):
    a = [1.0, 0.0]
    b = [0.0, 1.0]
    df = spark.createDataFrame(
        [(0, a), (1, a), (2, b)], "vec_id long, embedding array<float>"
    )
    # seeds 0 and 1 are identical → cluster 1 gets no members (ties → 0);
    # Lloyd fallback must keep its centroid instead of NaN-ing it
    model = kmeans.kmeans_fit(df, k=2, centroids=[a, a], max_iter=3)
    assert model[1] == pytest.approx(a)
    assert not np.isnan(np.asarray(model)).any()


def test_fit_insensitive_to_partitioning(spark):
    df = _blob_df(spark, seed=11)
    m2 = kmeans.kmeans_fit(df.repartition(2), k=3, max_iter=5)
    m7 = kmeans.kmeans_fit(df.repartition(7), k=3, max_iter=5)
    # double-precision means differ only by FP summation order
    assert np.allclose(np.asarray(m2), np.asarray(m7), atol=1e-9)


def test_cluster_summary_counts(spark):
    df = _blob_df(spark, seed=3, n_per=10)
    model = kmeans.kmeans_fit(df, k=3, max_iter=5)
    summ = {
        r["cluster"]: r["n"]
        for r in kmeans.cluster_summary(df, model).collect()
    }
    assert sorted(summ.values()) == [10, 10, 10]
