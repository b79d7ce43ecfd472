"""Benchmark decontamination (ext/decontam.py): hand-checked semantics,
edge cases, and the map-only plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from tulflow_spark.ext.decontam import (
    benchmark_gram_set,
    contamination,
    decontaminate,
)

BENCH = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "pack my box with five dozen liquor jugs"),
]
DOCS = [
    # shares the 5-gram "quick brown fox jumps over" with bench 100
    (1, "she saw the quick brown fox jumps over a fence today"),
    # shares two distinct bench 5-grams (one from each bench doc)
    (2, "quick brown fox jumps over and pack my box with five dozen"),
    # same words, different order — no shared 5-gram
    (3, "fox brown quick the jumps dog lazy the over"),
    # shorter than 5 tokens — clean by definition
    (4, "quick brown fox jumps"),
    # empty text
    (5, ""),
]
SCHEMA = "doc_id long, text string"


def test_contamination_flags_and_counts(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    bench = spark.createDataFrame(BENCH, SCHEMA)
    rep = {
        r.doc_id: (r.n_grams, r.n_hit, r.contaminated)
        for r in contamination(docs, bench, "doc_id", "text", n=5).collect()
    }
    # doc 1 contains "the quick brown fox jumps over": two overlapping
    # bench 5-grams
    assert rep[1] == (7, 2, True)
    # doc 2: hits "quick brown fox jumps over" + "pack my box with five"
    # + "my box with five dozen"
    assert rep[2][2] is True and rep[2][1] == 3
    assert rep[3] == (5, 0, False)
    assert rep[4] == (0, 0, False)  # < n tokens: no grams
    assert rep[5] == (0, 0, False)  # empty text


def test_decontaminate_drops_and_keeps_columns(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    bench = spark.createDataFrame(BENCH, SCHEMA)
    kept = decontaminate(docs, bench, "doc_id", "text", n=5)
    assert set(kept.columns) == {"doc_id", "text"}
    assert {r.doc_id for r in kept.collect()} == {3, 4, 5}
    # max_hits tolerance: doc 1 (2 hits) tolerated, doc 2 (3 hits) not
    loose = decontaminate(docs, bench, "doc_id", "text", n=5, max_hits=2)
    assert {r.doc_id for r in loose.collect()} == {1, 3, 4, 5}


def test_empty_benchmark_keeps_everything(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    bench = spark.createDataFrame([], SCHEMA)
    assert decontaminate(docs, bench, "doc_id", "text", n=5).count() == len(
        DOCS
    )
    rep = contamination(docs, bench, "doc_id", "text", n=5)
    assert rep.filter(F.col("contaminated")).count() == 0


def test_bench_gram_set_is_one_sorted_row(spark):
    bench = spark.createDataFrame(BENCH, SCHEMA)
    rows = benchmark_gram_set(bench, "text", n=5).collect()
    assert len(rows) == 1
    grams = rows[0]["_bench"]
    # 9 tokens -> 5 grams, 8 tokens -> 4 grams, all distinct across docs
    assert len(grams) == 9
    assert grams == sorted(grams)
    assert all(len(g) == 16 for g in grams)


def test_batch_plan_probes_broadcast_hash_table(spark, sf_dir):
    """The batch path must probe a ONCE-BUILT benchmark hash table
    (BroadcastHashJoin over exploded grams), never re-hash the benchmark
    array per corpus row (no array_intersect in the batch plan — that
    form is O(rows x bench_grams), measured quadratic-ish), and never
    sort-merge or nested-loop anything.  Document text reaches no
    exchange: only (id, count) frames shuffle."""
    from tulflow_spark.io import table

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    plan = decontaminate(
        corpus, bench, "doc_id", "text", n=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "array_intersect" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # text never shuffles: no Exchange line carries the text column
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_decontaminate_works_on_streams(spark, tmp_path):
    """The operator is a stateless map over a broadcast set, so the SAME
    code runs on a readStream frame (stream-static broadcast join) —
    streaming ingest gets decontamination for free, with batch-identical
    survivors."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    corpus.coalesce(2).write.parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(tmp_path / "src"))
    q = (
        decontaminate(stream, bench, "doc_id", "text", n=5)
        .writeStream.format("memory")
        .queryName("dc_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id for r in spark.table("dc_stream").collect()}
    exp = {
        r.doc_id
        for r in decontaminate(corpus, bench, "doc_id", "text", n=5).collect()
    }
    assert got == exp


def test_null_id_and_duplicate_id_semantics(spark):
    """NULL-id documents still flag and drop (null-safe joins), and a
    duplicated id counts DISTINCT benchmark grams across its rows."""
    bench = spark.createDataFrame(BENCH, SCHEMA)
    docs = spark.createDataFrame(
        [
            (None, "she saw the quick brown fox jumps over a fence"),
            (7, "pack my box with five dozen liquor jugs today"),
            (7, "pack my box with five dozen liquor jugs today"),
            (8, "nothing shared at all in this one"),
        ],
        SCHEMA,
    )
    rep = {r.doc_id: (r.n_hit, r.contaminated)
           for r in contamination(docs, bench, "doc_id", "text", n=5)
           .dropDuplicates(["doc_id"]).collect()}
    assert rep[None][1] is True          # NULL id still reported
    assert rep[7] == (4, True)           # distinct grams, not 2x4
    assert rep[8] == (0, False)
    kept = decontaminate(docs, bench, "doc_id", "text", n=5)
    assert {r.doc_id for r in kept.collect()} == {8}  # NULL id dropped
