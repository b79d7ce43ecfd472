"""ANN index persistence: loaded indexes reproduce in-memory search
exactly, and the IVF on-disk layout partition-prunes probes."""

from __future__ import annotations

from pyspark.sql import functions as F

from tulflow_spark.ext.ann_store import (
    load_ivf_index,
    load_pq,
    save_ivf_index,
    save_pq,
)
from tulflow_spark.ext.ivf import build_ivf_index
from tulflow_spark.io import table


def _emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


def test_ivf_save_load_identical_results(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    idx = build_ivf_index(emb, n_clusters=8)
    path = str(tmp_path / "ivf")
    save_ivf_index(idx, path)
    loaded = load_ivf_index(spark, path)

    from tulflow_spark.ext.similarity import query_vector

    vec = query_vector(emb, "vec_id", "embedding", 0)
    a = idx.search(vec, k=10, n_probes=4).collect()
    b = loaded.search(vec, k=10, n_probes=4).collect()
    assert [(r.vec_id, round(r.cosine_sim, 12)) for r in a] == [
        (r.vec_id, round(r.cosine_sim, 12)) for r in b
    ]


def test_ivf_loaded_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    """The on-disk payoff: probing k clusters reads ONLY their partition
    directories (PartitionFilters on cluster in the scan)."""
    emb = _emb(spark, sf_dir)
    idx = build_ivf_index(emb, n_clusters=8)
    path = str(tmp_path / "ivf2")
    save_ivf_index(idx, path)
    loaded = load_ivf_index(spark, path)

    from tulflow_spark.ext.similarity import query_vector

    vec = query_vector(emb, "vec_id", "embedding", 0)
    df = loaded.search(vec, k=5, n_probes=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cluster" in pf, pf  # probe filter reached the directory level


def test_pq_save_load_identical_topk(spark, sf_dir, tmp_path):
    from tulflow_spark.ext import pq as P
    from tulflow_spark.ext.similarity import query_vector

    emb = _emb(spark, sf_dir)
    cb = P.pq_train(emb, dim=64, m=8, ksub=16, max_iter=2)
    rest = emb.filter(F.col("vec_id") != 0)
    codes = P.pq_encode(rest, cb)
    path = str(tmp_path / "pq")
    save_pq(cb, codes, path)
    cb2, codes2 = load_pq(spark, path)
    assert (cb2 == cb).all()

    vec = query_vector(emb, "vec_id", "embedding", 0)
    a = P.pq_topk(codes, cb, vec, k=10, rerank=30)
    b = P.pq_topk(codes2, cb2, vec, k=10, rerank=30)
    ids_a = [r.vec_id for r in a.collect()]
    ids_b = [r.vec_id for r in b.collect()]
    assert ids_a == ids_b


def test_append_to_saved_index_without_retrain(spark, sf_dir, tmp_path):
    """Incremental maintenance: new vectors join the saved index under its
    OWN (euclidean) metric and become searchable; existing data is
    untouched (append, not rewrite)."""
    emb = _emb(spark, sf_dir)
    idx = build_ivf_index(emb, n_clusters=8)
    path = str(tmp_path / "ivf3")
    save_ivf_index(idx, path)

    # a new vector: near-duplicate of vec 1 with a huge id
    from tulflow_spark.ext.ann_store import append_to_ivf_index
    from tulflow_spark.ext.similarity import query_vector

    v1 = list(query_vector(emb, "vec_id", "embedding", 1))
    new = spark.createDataFrame(
        [(99_999, [float(x) + 1e-4 for x in v1], 0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    n = append_to_ivf_index(spark, path, new)
    assert n == 1

    loaded = load_ivf_index(spark, path)
    hits = loaded.search(v1, k=3, n_probes=8).collect()
    ids = [r.vec_id for r in hits]
    assert 99_999 in ids and 1 in ids  # appended vector is searchable


def test_ivfpq_save_load_search_exact(spark, sf_dir, tmp_path):
    """Loaded IVF-PQ search must equal in-memory search (without rerank —
    the codes-only store keeps no raw vectors), and the probe filter must
    prune cluster directories in the scan."""
    from tulflow_spark.ext.ann_store import load_ivfpq, save_ivfpq
    from tulflow_spark.ext.ivfpq import build_ivfpq, ivfpq_topk
    from tulflow_spark.ext.similarity import query_vector
    from tulflow_spark.io import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vec = query_vector(emb, "vec_id", "embedding", 0)
    idx = build_ivfpq(emb, n_clusters=8, dim=64, m=8, ksub=16, max_iter=2,
                      keep_vectors=False)
    mem = [(r["vec_id"], r["pq_score"])
           for r in ivfpq_topk(idx, vec, k=10, n_probes=4).collect()]

    save_ivfpq(idx, str(tmp_path / "ivfpq"))
    loaded = load_ivfpq(spark, str(tmp_path / "ivfpq"))
    got = [(r["vec_id"], r["pq_score"])
           for r in ivfpq_topk(loaded, vec, k=10, n_probes=4).collect()]
    assert got == mem

    plan = (
        ivfpq_topk(loaded, vec, k=10, n_probes=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the probe filter must reach the scan as a PARTITION filter (pruned
    # cluster directories), not a post-scan row filter
    assert "PartitionFilters" in plan
    assert plan.count("PartitionFilters: []") == 0, plan


def test_ivfpq_append_searchable_without_retrain(spark, sf_dir, tmp_path):
    """A vector appended after save must be findable: append its codes via
    the stored centroids/codebook (no retrain), reload, search with the
    vector itself as the query — it must rank first (self-similarity
    survives residual quantization + exact knowledge of its own codes)."""
    from pyspark.sql import functions as F

    from tulflow_spark.ext.ann_store import (
        append_to_ivfpq,
        load_ivfpq,
        save_ivfpq,
    )
    from tulflow_spark.ext.ivfpq import build_ivfpq, ivfpq_topk
    from tulflow_spark.io import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 400)
    newbie = emb.filter(F.col("vec_id") == 450).withColumn(
        "vec_id", F.lit(999_999).cast("long")
    )
    idx = build_ivfpq(base, n_clusters=8, dim=64, m=8, ksub=16, max_iter=2,
                      keep_vectors=False)
    save_ivfpq(idx, str(tmp_path / "ivfpq"))
    n = append_to_ivfpq(spark, str(tmp_path / "ivfpq"), newbie)
    assert n == 1

    loaded = load_ivfpq(spark, str(tmp_path / "ivfpq"))
    assert loaded.encoded.count() == base.count() + 1
    q = [float(x) for x in newbie.head()["embedding"]]
    top = ivfpq_topk(loaded, q, k=3, n_probes=8).collect()
    assert top[0]["vec_id"] == 999_999


def test_ivfpq_drift_retrain_trigger(spark, sf_dir, tmp_path):
    """The retrain policy must stay quiet for same-distribution ingest and
    fire for concentrated traffic: a batch drawn from the same corpus
    scores PSI well under the 0.25 action level, while a batch of copies
    of one vector (everything lands in a single cluster) scores far over
    it.  The per-cluster table carries the full k-bucket spine."""
    from pyspark.sql import functions as F

    from tulflow_spark.ext.ann_store import (
        ivfpq_assignment_drift,
        save_ivfpq,
    )
    from tulflow_spark.ext.ivfpq import build_ivfpq
    from tulflow_spark.io import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 400)
    idx = build_ivfpq(base, n_clusters=8, dim=64, m=8, ksub=16, max_iter=2,
                      keep_vectors=False)
    save_ivfpq(idx, str(tmp_path / "ivfpq"))

    same = emb.filter(F.col("vec_id") >= 400)
    psi, retrain, tbl = ivfpq_assignment_drift(
        spark, str(tmp_path / "ivfpq"), same
    )
    assert retrain is False and psi < 0.1, psi
    assert tbl.count() == 8  # full spine even if a cluster saw nothing

    one = emb.filter(F.col("vec_id") == 450)
    skew = one
    for _ in range(5):
        skew = skew.unionByName(one)
    skew = skew.withColumn("vec_id", F.monotonically_increasing_id())
    psi2, retrain2, _ = ivfpq_assignment_drift(
        spark, str(tmp_path / "ivfpq"), skew
    )
    assert retrain2 is True and psi2 > 0.25, psi2
