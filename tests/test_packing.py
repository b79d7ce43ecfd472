"""Token-level packing (ext/packing.py): boundary splitting, ordering,
tail handling, and the no-single-partition plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from tulflow_spark.ext.packing import pack_token_ids


def _pack(spark, rows, seq_len):
    df = spark.createDataFrame(rows, "doc_id long, ids array<bigint>")
    out = pack_token_ids(df, "doc_id", "ids", seq_len=seq_len)
    return {r.seq_id: (list(r.ids), r.n_tokens, r.n_docs)
            for r in out.collect()}


def test_stream_is_contiguous_and_ordered(spark):
    """Concatenating the sequences in seq_id order must reproduce the
    md5-ordered concatenation of the inputs exactly."""
    rows = [(i, [i * 100 + j for j in range(7)]) for i in range(20)]
    got = _pack(spark, rows, seq_len=16)
    # expected stream: docs sorted by (md5(id), id)
    import hashlib

    order = sorted(rows, key=lambda r: (hashlib.md5(
        str(r[0]).encode()).hexdigest(), r[0]))
    stream = [x for _, ids in order for x in ids]
    rebuilt = [x for sid in sorted(got) for x in got[sid][0]]
    assert rebuilt == stream
    # every sequence but the last is exactly seq_len
    sids = sorted(got)
    assert all(got[s][1] == 16 for s in sids[:-1])
    assert got[sids[-1]][1] == len(stream) - 16 * (len(sids) - 1)


def test_document_splits_across_boundary(spark):
    """A document longer than seq_len must span multiple sequences, and
    n_docs counts every contributing document per sequence."""
    got = _pack(spark, [(1, list(range(10)))], seq_len=4)
    assert [got[s][0] for s in sorted(got)] == [
        [0, 1, 2, 3], [4, 5, 6, 7], [8, 9]
    ]
    assert all(got[s][2] == 1 for s in got)


def test_empty_docs_contribute_nothing(spark):
    got = _pack(spark, [(1, [7, 8]), (2, [])], seq_len=4)
    total = sum(got[s][1] for s in got)
    assert total == 2


def test_plan_single_partition_only_for_offsets_frame(spark, sf_dir):
    """Like mx2: the ONLY SinglePartition is the cumulative window over
    the <=256-row per-bucket totals frame; the full-data window
    partitions by bucket and assembly shuffles on seq_id."""
    from tulflow_spark.plans import EXTRA_QUERIES, QUERIES, load_all

    load_all()
    plan = (
        {**QUERIES, **EXTRA_QUERIES}["pack1_token_sequences"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("SinglePartition") == 1
    assert "_bkt" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
