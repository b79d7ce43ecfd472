"""IVF index tests: recall against brute force, probe-fraction scan bound."""

from __future__ import annotations

import pytest

from tulflow_spark.ext.ivf import build_ivf_index
from tulflow_spark.ext.similarity import brute_force_topk, query_vector
from tulflow_spark.io import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark):
    emb = table(spark, SF, "embeddings")
    return build_ivf_index(emb, n_clusters=8)


def test_ivf_full_probe_equals_brute_force(spark, index):
    """Probing ALL clusters must reproduce the exact brute-force top-k."""
    emb = table(spark, SF, "embeddings")
    q = query_vector(emb, "vec_id", "embedding", 0)
    exact = [r.vec_id for r in brute_force_topk(emb, q, k=10).collect()]
    ivf_all = [r.vec_id for r in index.search(q, k=10, n_probes=8).collect()]
    assert ivf_all == exact


def test_ivf_partial_probe_recall(spark, index):
    """With half the clusters probed, recall@10 should be decent and the
    query vector's own id must rank first (it lives in its probe cluster)."""
    emb = table(spark, SF, "embeddings")
    q = query_vector(emb, "vec_id", "embedding", 0)
    exact = {r.vec_id for r in brute_force_topk(emb, q, k=10).collect()}
    got = [r.vec_id for r in index.search(q, k=10, n_probes=4).collect()]
    assert got[0] == 0  # the query's own vector
    assert len(set(got) & exact) >= 5


def test_ivf_scan_is_bounded(index):
    """n_probes clusters ⇒ only those clusters' rows are scanned."""
    counts = {r.cluster: r["count"] for r in index.assigned.groupBy("cluster").count().collect()}
    assert len(counts) == 8
    total = sum(counts.values())
    assert total == 500
    # a 2-probe search touches at most the two largest clusters' rows
    two_largest = sum(sorted(counts.values())[-2:])
    assert two_largest < total  # strictly partial scan
