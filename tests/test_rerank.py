"""Re-rank plumbing (ext/rerank.py): scorer semantics, pluggable model
slot, top-k windowing, typed wall."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tulflow_spark.ext.rerank import (
    cross_score,
    model_cross_encoder,
    rerank_topk,
    token_jaccard_scorer,
)


def test_token_jaccard_scorer_semantics():
    q = pd.Series(["a b c", "a a a", "", "x y"])
    d = pd.Series(["b c d", "a", "anything", ""])
    got = token_jaccard_scorer(q, d)
    assert got[0] == 2 / 4  # {a,b,c} vs {b,c,d}
    assert got[1] == 1.0  # duplicates collapse: {a} vs {a}
    assert got[2] == 0.0  # empty query -> no overlap
    assert got[3] == 0.0  # empty doc


def test_cross_score_and_custom_scorer(spark):
    pairs = spark.createDataFrame(
        [(1, "a b", "b c"), (2, "x", "x")], "id long, q string, d string"
    )
    by_id = {
        r.id: r.score for r in cross_score(pairs, "q", "d").collect()
    }
    assert by_id[1] == pytest.approx(1 / 3)
    assert by_id[2] == 1.0
    # model slot: any callable with the batch signature drops in
    fixed = cross_score(
        pairs, "q", "d", scorer=lambda q, d: [42.0] * len(q)
    )
    assert {r.score for r in fixed.collect()} == {42.0}


def test_model_wall_is_typed():
    with pytest.raises(NotImplementedError, match="torch"):
        model_cross_encoder()


def test_rerank_topk_orders_and_truncates(spark):
    queries = spark.createDataFrame(
        [(10, "alpha beta gamma")], "qid long, qt string"
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),  # jaccard 1.0
            (2, "alpha beta zeta"),  # 2/4
            (3, "alpha x y"),  # 1/5
            (4, "nothing shared"),  # 0.0
            (5, "alpha beta zeta"),  # 2/4, tie with 2 -> doc_id order
        ],
        "did long, dt string",
    )
    cands = spark.createDataFrame(
        [(10, d) for d in (1, 2, 3, 4, 5)], "qid long, did long"
    )
    out = rerank_topk(
        cands, queries, docs, "qid", "did", "qt", "dt", k=3
    ).collect()
    assert [(r.did, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
        (1, 1),
        (2, 2),
        (5, 3),
    ]
    assert all(r.qid == 10 for r in out)


def test_rerank_plan_broadcasts_queries_no_single_partition(spark, sf_dir):
    """Queries broadcast (never shuffle the corpus against a tiny table)
    and the top-k window partitions by query id — no SinglePartition."""
    from tulflow_spark.plans import EXTRA_QUERIES, QUERIES, load_all

    load_all()
    plan = (
        {**QUERIES, **EXTRA_QUERIES}["rr1_rerank_topk"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert "SinglePartition" not in plan


def test_lexical_jvm_path_equals_python_path(spark, sf_dir):
    """lexical_rerank_topk must reproduce rerank_topk's default-scorer
    output bit for bit (same token sets, same IEEE division, same ties)
    — and stay pure JVM (no Python workers in its plan)."""
    from tulflow_spark.ext.rerank import lexical_rerank_topk
    from tulflow_spark.io import table

    docs = table(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    cands = docs.withColumn("_b", F.col("doc_id") % 7).join(
        F.broadcast(
            queries.select("query_id", (F.col("query_id") % 7).alias("_b"))
        ),
        "_b",
    ).filter(F.col("doc_id") != F.col("query_id")).select(
        "query_id", "doc_id"
    )
    args = (cands, queries.select("query_id", "text"),
            docs.select("doc_id", "text"),
            "query_id", "doc_id", "text", "text")
    jvm = lexical_rerank_topk(*args, k=5)
    py = rerank_topk(*args, k=5)
    assert sorted(map(tuple, jvm.collect())) == sorted(map(tuple, py.collect()))
    plan = jvm._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
