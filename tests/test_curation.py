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


def test_curate_pipeline_fully_deduped_doc_still_packed(spark):
    """A document whose every line first occurred elsewhere survives with
    n_kept=0 / n_tokens=0 and still gets a packing slot (zero-width)."""
    from tulflow_spark.ext.curation import curate_pipeline

    # identical quality-passing body; doc 2 is an exact copy of doc 1's
    # second half so after line dedup nothing of doc 2 remains
    body1 = "the cat sat on the mat and the dog ran to the door in a hall"
    body2 = "and the dog ran to the door in a hall"
    rows = [(1, "s", body1), (2, "s", body2)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r.doc_id: r.asDict()
        for r in curate_pipeline(
            df, "doc_id", "text", "source", min_quality=0.0,
            words_per_line=3, seq_len=8,
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_kept"] == out[1]["n_lines"] == 6
    # doc2 chunks to 'and the dog'/'ran to the'/'door in a'/'hall' — every
    # one first occurred in doc1 (16 words = 5 full chunks + 'hall'), so
    # line dedup erases doc2 entirely
    assert out[2]["n_lines"] == 4 and out[2]["n_kept"] == 0
    assert out[2]["n_tokens"] == 0
    # packing invariant: offsets within seq_len, ids non-negative
    for r in out.values():
        assert 0 <= r["seq_offset"] < 8 and r["seq_id"] >= 0
