"""BM25 inverted index (ext/bm25.py): hand-checked scoring, index
layout, directory pruning, and determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tulflow_spark.ext.bm25 import bm25_search, build_bm25_index

DOCS = [
    (1, "spark engine spark"),          # tf(spark)=2, dl=3
    (2, "spark runs fast"),             # tf(spark)=1, dl=3
    (3, "nothing relevant here at all"),  # dl=5
    (4, "engine room"),                 # dl=2
]
SCHEMA = "doc_id long, text string"


def _expected_score(tf, dl, df, n, avgdl, terms_hit):
    idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1.0), 9)
    sat = (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    return round(idf * sat, 9)


def test_hand_checked_scores_and_ranks(spark, tmp_path):
    path = str(tmp_path / "idx")
    meta = build_bm25_index(
        spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text", path
    )
    assert meta["n_docs"] == 4 and meta["avgdl"] == 13 / 4
    got = {r.doc: (r.score, r.rank)
           for r in bm25_search(spark, path, ["spark"], k=10).collect()}
    # only docs 1 and 2 match; doc 1 (tf=2) outranks doc 2 (tf=1)
    assert set(got) == {1, 2}
    assert got[1][1] == 1 and got[2][1] == 2
    e1 = _expected_score(2, 3, 2, 4, 13 / 4, 1)
    e2 = _expected_score(1, 3, 2, 4, 13 / 4, 1)
    assert got[1][0] == pytest.approx(e1, abs=1e-9)
    assert got[2][0] == pytest.approx(e2, abs=1e-9)
    # multi-term query sums contributions; rare term boosts doc 4
    multi = {r.doc: r.rank
             for r in bm25_search(spark, path, ["engine", "room"], k=10)
             .collect()}
    assert multi[4] == 1  # matches both terms


def test_case_insensitive_and_empty_query(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_bm25_index(spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text", path)
    up = {r.doc for r in bm25_search(spark, path, ["SPARK"], k=10).collect()}
    assert up == {1, 2}
    with pytest.raises(ValueError):
        bm25_search(spark, path, [])


def test_posting_read_is_partition_pruned(spark, sf_dir, tmp_path):
    """A one-term query must read only that term's _pp partition: the
    scan's PartitionFilters carry the _pp IN (...) predicate, and no
    Python appears anywhere."""
    from tulflow_spark.io import table

    path = str(tmp_path / "idx")
    build_bm25_index(table(spark, sf_dir, "documents"), "doc_id", "text", path)
    df = bm25_search(spark, path, ["join"], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the postings scan is the FileScan carrying tf in its schema (the
    # path may be truncated in the rendered plan)
    post_lines = [l for l in plan.splitlines()
                  if "FileScan" in l and "tf:bigint" in l]
    assert post_lines, plan
    pf = post_lines[0].split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "_pp" in pf and "=" in pf  # pruned to the term's partition
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_append_equals_rebuild(spark, sf_dir, tmp_path):
    """The incremental invariant: building on half the corpus then
    appending the other half yields search results IDENTICAL to an index
    built on the whole corpus — postings rows, df counts, and avgdl all
    add exactly, and idf re-derives from the exact (N, df)."""
    from tulflow_spark.ext.bm25 import append_to_bm25_index
    from tulflow_spark.io import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    inc_path = str(tmp_path / "inc")
    full_path = str(tmp_path / "full")
    build_bm25_index(a, "doc_id", "text", inc_path)
    meta_inc = append_to_bm25_index(spark, inc_path, b, "doc_id", "text")
    meta_full = build_bm25_index(docs, "doc_id", "text", full_path)
    assert meta_inc["n_docs"] == meta_full["n_docs"]
    assert meta_inc["total_tokens"] == meta_full["total_tokens"]
    assert meta_inc["avgdl"] == meta_full["avgdl"]
    for q in (["join"], ["join", "scan", "merge"], ["customer"]):
        inc = [(r.doc, r.score, r.rank)
               for r in bm25_search(spark, inc_path, q, k=10).collect()]
        full = [(r.doc, r.score, r.rank)
                for r in bm25_search(spark, full_path, q, k=10).collect()]
        assert inc == full, q


def test_phrase_search_positions(spark, tmp_path):
    """Positional phrase matching: consecutive-token semantics, overlap
    counting, multi-occurrence counting, and the typed wall for
    non-positional indexes."""
    from tulflow_spark.ext.bm25 import phrase_search

    docs = [
        (1, "fast hash join wins"),           # 1 occurrence
        (2, "hash join hash join"),           # 2 occurrences
        (3, "hash then join"),                # not consecutive
        (4, "join hash"),                     # wrong order
        (5, "a a a"),                         # overlapping "a a" x2
    ]
    path = str(tmp_path / "pidx")
    build_bm25_index(
        spark.createDataFrame(docs, SCHEMA), "doc_id", "text", path,
        positions=True,
    )
    got = {r.doc: r.n_occurrences
           for r in phrase_search(spark, path, "hash join").collect()}
    assert got == {1: 1, 2: 2}
    over = {r.doc: r.n_occurrences
            for r in phrase_search(spark, path, ["a", "a"]).collect()}
    assert over == {5: 2}  # positional intersection counts overlaps
    # non-positional index -> typed error
    path2 = str(tmp_path / "npidx")
    build_bm25_index(spark.createDataFrame(docs, SCHEMA), "doc_id", "text", path2)
    with pytest.raises(ValueError, match="positions"):
        phrase_search(spark, path2, "hash join")
    # positional append keeps phrases searchable over appended docs
    from tulflow_spark.ext.bm25 import append_to_bm25_index

    append_to_bm25_index(
        spark,
        path,
        spark.createDataFrame([(9, "giant hash join")], SCHEMA),
        "doc_id",
        "text",
    )
    got2 = {r.doc: r.n_occurrences
            for r in phrase_search(spark, path, "hash join").collect()}
    assert got2 == {1: 1, 2: 2, 9: 1}


def test_streaming_ingest_keeps_index_searchable(spark, tmp_path):
    """Daily-ingest story for search: a foreachBatch sink appending each
    micro-batch into the BM25 index via append_to_bm25_index keeps the
    index searchable after every batch, and the final index equals a
    batch rebuild (the append==rebuild invariant driven from a stream)."""
    import os as _os

    from pyspark.sql import functions as F

    from tulflow_spark.ext.bm25 import append_to_bm25_index

    rows = [(i, f"doc number {i} talks about topic{i % 5} extensively")
            for i in range(60)]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    for b in range(3):
        spark.createDataFrame(
            rows[b * 20 : (b + 1) * 20], schema
        ).coalesce(1).write.parquet(str(src / f"b{b}"))
    flat = tmp_path / "flat"
    _os.makedirs(flat)
    i = 0
    for sub in sorted(_os.listdir(src)):
        for f in sorted(_os.listdir(src / sub)):
            if f.endswith(".parquet"):
                _os.link(src / sub / f, flat / f"{i:03d}.parquet")
                i += 1

    path = str(tmp_path / "idx")
    # seed the index empty-ish with the first row so append has a base
    build_bm25_index(
        spark.createDataFrame(rows[:1], schema), "doc_id", "text", path
    )

    def ingest(batch_df, batch_id):
        fresh = batch_df.filter(F.col("doc_id") != 0)
        if fresh.count():
            append_to_bm25_index(
                spark, path, fresh, "doc_id", "text"
            )

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(flat))
    q = stream.writeStream.foreachBatch(ingest).start()
    q.processAllAvailable()
    q.stop()

    full_path = str(tmp_path / "full")
    build_bm25_index(
        spark.createDataFrame(rows, schema), "doc_id", "text", full_path
    )
    inc = [(r.doc, r.score, r.rank)
           for r in bm25_search(spark, path, ["topic3"], k=10).collect()]
    full = [(r.doc, r.score, r.rank)
            for r in bm25_search(spark, full_path, ["topic3"], k=10)
            .collect()]
    assert inc == full and len(inc) == 10
