"""Exact substring dedup: handcrafted corpora with KNOWN repeated spans —
span boundaries, overlap merging, min_count, and span cutting are all
asserted against hand-derived expectations (the DuckDB mirror is tested
separately by the dd10 oracle pair)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tulflow_spark.ext.substring import cut_spans, repeated_spans


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


W = "w"  # filler word maker: w0 w1 w2 ...


def words(*idx):
    return " ".join(f"{W}{i}" for i in idx)


def test_single_repeated_run_merges_to_one_maximal_span(spark):
    # docs 0 and 1 share tokens a0..a9 (10 tokens) at different offsets;
    # with n=4 every 4-window inside the run repeats → ONE maximal span
    shared = " ".join(f"a{i}" for i in range(10))
    d0 = shared + " " + words(1, 2, 3)
    d1 = words(4, 5) + " " + shared
    sp = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in repeated_spans(_docs(spark, [d0, d1]), n=4).collect()
    }
    # doc0: tokens 0..10 exclusive; 7 windows (0..6).  doc1: offset 2.
    assert sp == {(0, 0, 10, 7), (1, 2, 12, 7)}


def test_disjoint_repeats_stay_separate_spans(spark):
    blk1 = " ".join(f"b{i}" for i in range(5))
    blk2 = " ".join(f"c{i}" for i in range(5))
    gap1 = words(10, 11, 12, 13)
    gap2 = words(20, 21, 22, 23)
    d0 = blk1 + " " + gap1 + " " + blk2
    d1 = blk2 + " " + gap2 + " " + blk1
    out = repeated_spans(_docs(spark, [d0, d1]), n=5).collect()
    spans0 = sorted(
        (r.span_start, r.span_end) for r in out if r.doc_id == 0
    )
    assert spans0 == [(0, 5), (9, 14)]  # two separate maximal spans


def test_min_count_three_excludes_pairs(spark):
    shared = " ".join(f"s{i}" for i in range(6))
    docs = _docs(
        spark,
        [shared + " " + words(1), shared + " " + words(2), words(3, 4, 5)],
    )
    assert repeated_spans(docs, n=6, min_count=3).count() == 0
    assert repeated_spans(docs, n=6, min_count=2).count() == 2


def test_within_document_repeat_detected(spark):
    # the repeated block occurs twice INSIDE one doc — total count 2
    blk = " ".join(f"r{i}" for i in range(5))
    d0 = blk + " " + words(1, 2) + " " + blk
    out = sorted(
        (r.span_start, r.span_end)
        for r in repeated_spans(_docs(spark, [d0]), n=5).collect()
    )
    assert out == [(0, 5), (7, 12)]


def test_cut_spans_removes_exactly_the_spans(spark):
    shared = " ".join(f"x{i}" for i in range(8))
    d0 = shared + " tail0 tail1"
    d1 = "head0 " + shared
    docs = _docs(spark, [d0, d1])
    spans = repeated_spans(docs, n=8)
    cut = {r.doc_id: r.text for r in cut_spans(docs, spans).collect()}
    assert cut[0] == "tail0 tail1"
    assert cut[1] == "head0"


def test_cut_spans_leaves_unspanned_docs_untouched(spark):
    docs = _docs(spark, ["alpha beta gamma", "delta epsilon zeta"])
    spans = repeated_spans(docs, n=3)
    assert spans.count() == 0
    cut = {r.doc_id: r.text for r in cut_spans(docs, spans).collect()}
    assert cut == {0: "alpha beta gamma", 1: "delta epsilon zeta"}


def test_short_docs_skipped_not_crashed(spark):
    docs = _docs(spark, ["one two", "", "   ", "a b c d e"])
    assert repeated_spans(docs, n=5).count() == 0
