"""ext.pq: product-quantization training, encoding, ADC search."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tulflow_spark.ext import pq


def test_pq_reconstructs_exactly_when_codebook_covers_data(spark):
    """If each subspace has <= ksub distinct sub-vectors, Lloyd converges to
    them exactly and the ADC score equals the exact dot product."""
    rng = np.random.default_rng(4)
    protos = rng.normal(size=(4, 16))  # 4 prototype vectors, d=16
    rows = [
        (i, [float(x) for x in protos[i % 4]]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = pq.pq_train(df, dim=16, m=4, ksub=4, max_iter=3)
    enc = pq.pq_encode(df, cb)
    q = [float(x) for x in protos[1]]
    got = pq.pq_topk(enc, cb, q, k=4).collect()
    # highest ADC score must be the float32-rounded exact dot with proto 1
    v32 = np.asarray(protos[1], dtype=np.float32).astype(np.float64)
    expect = float(np.dot(v32, v32))
    assert abs(got[0]["pq_score"] - expect) < 1e-4
    # the 16 copies of proto-1 occupy the top-4 (ids tie-broken ascending)
    assert [r["vec_id"] for r in got] == [1, 5, 9, 13]


def test_pq_overlap_vs_brute_force(spark, sf_dir):
    """On the real corpus, ADC top-10 with exact re-rank of 50 candidates
    recovers most of the brute-force top-10 (recall pin, not exactness —
    PQ is lossy by design)."""
    from tulflow_spark.ext.similarity import brute_force_topk, query_vector
    from tulflow_spark.io import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vec = query_vector(emb, "vec_id", "embedding", 0)
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in brute_force_topk(rest, vec, k=10).collect()}

    cb = pq.pq_train(emb, dim=64, m=8, ksub=16, max_iter=4)
    enc = pq.pq_encode(rest, cb)
    approx = {
        r["vec_id"]
        for r in pq.pq_topk(enc, cb, vec, k=10, rerank=50).collect()
    }
    overlap = len(exact & approx) / 10
    assert overlap >= 0.5, f"overlap@10 {overlap}"


def test_pq_codes_are_compact_and_deterministic(spark, sf_dir):
    from tulflow_spark.io import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = pq.pq_train(emb, dim=64, m=8, ksub=16, max_iter=2)
    a = pq.pq_encode(emb, cb).select("vec_id", "pq_codes").collect()
    b = pq.pq_encode(emb.repartition(7), cb).select("vec_id", "pq_codes").collect()
    da = {r["vec_id"]: list(r["pq_codes"]) for r in a}
    db = {r["vec_id"]: list(r["pq_codes"]) for r in b}
    assert da == db
    assert all(len(c) == 8 and max(c) < 16 and min(c) >= 0 for c in da.values())


def test_pq_scoring_is_jvm_side(spark, sf_dir):
    """The ADC scan stage must contain no Python evaluation — scoring the
    codes column is pure column algebra (the point of PQ at scale)."""
    from tulflow_spark.io import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    from tulflow_spark.ext.similarity import query_vector

    vec = query_vector(emb, "vec_id", "embedding", 0)
    cb = pq.pq_train(emb, dim=64, m=8, ksub=16, max_iter=1)
    enc = pq.pq_encode(emb, cb).select("vec_id", "pq_codes")
    # materialize codes to parquet: the search-time scan reads ONLY codes
    topk = pq.pq_topk(enc, cb, vec, k=10)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the scoring stage (below the already-encoded frame) has no Python;
    # encoding's ArrowEvalPython is upstream of the codes column, so assert
    # the score expression itself is aggregate() over the lut, not a UDF
    assert "pythonUDF" not in plan.split("TakeOrderedAndProject")[0]
