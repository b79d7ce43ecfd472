"""Curation pipeline: cache-lifecycle contract (r3 VERDICT: curate_near_dup
persisted its base and never unpersisted — leaked a cached frame per call)
and base-reuse equivalence.  Result semantics are oracle-gated by
cur1/cur2/vr1; these pin the resource behavior the gate can't see."""

from __future__ import annotations

from tulflow_spark.ext.curation import curate_exact, curate_near_dup
from tulflow_spark.io import table


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_curate_near_dup_leaves_no_cached_rdds(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    before = _n_cached(spark)
    out = curate_near_dup(docs, "doc_id", "text", 0.4, 0.8)
    n = out.count()
    assert n > 0
    assert _n_cached(spark) == before  # no cache leaked by the call


def test_curate_near_dup_accepts_caller_owned_base(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    expected = sorted(
        r["doc_id"] for r in curate_near_dup(docs, "doc_id", "text", 0.4, 0.8)
        .select("doc_id").collect()
    )
    base = curate_exact(docs, "doc_id", "text", 0.4).persist()
    try:
        got = sorted(
            r["doc_id"]
            for r in curate_near_dup(docs, "doc_id", "text", 0.4, 0.8, base=base)
            .select("doc_id").collect()
        )
    finally:
        base.unpersist()
    assert got == expected
