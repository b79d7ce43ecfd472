"""Curation pipeline: cache-lifecycle contract (r3 VERDICT: curate_near_dup
persisted its base and never unpersisted — leaked a cached frame per call)
and base-reuse equivalence.  Result semantics are oracle-gated by
cur1/cur2/vr1; these pin the resource behavior the gate can't see."""

from __future__ import annotations

from tulflow_spark.ext.curation import curate_exact, curate_near_dup
from tulflow_spark.io import table


def _cached_ids(spark) -> set:
    jsc = spark.sparkContext._jsc
    return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}


def test_curate_near_dup_leaves_no_cached_rdds(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    before = _cached_ids(spark)
    out = curate_near_dup(docs, "doc_id", "text", 0.4, 0.8)
    n = out.count()
    assert n > 0
    # no NEW cached RDDs introduced by the call (ids cached by earlier
    # tests may be garbage-collected concurrently, so compare id sets,
    # not counts)
    assert _cached_ids(spark) - before == set()


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
