"""ext/numeric_scorer.py: the persisted-weights logistic scorer proving
the re-rank model slot's contract (r6 VERDICT #4)."""

from __future__ import annotations

import math

import pandas as pd

from tulflow_spark.ext.numeric_scorer import (
    DEFAULT_BIAS,
    DEFAULT_WEIGHTS,
    NumericScorer,
    load_scorer,
    pair_features,
)


def _round9(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e9 + 0.5), x) / 1e9


def test_forward_pass_hand_computed():
    q = pd.Series(["red green blue", "alpha beta"])
    d = pd.Series(["green blue yellow", "gamma delta epsilon"])
    s = NumericScorer()
    got = s(q, d)
    # pair 0: overlap 2, union 4, dlen 3, jacc .5
    w0, w1, w2, w3 = DEFAULT_WEIGHTS
    z0 = _round9(DEFAULT_BIAS + w0 * 2 + w1 * 4 + w2 * 3 + w3 * 0.5)
    assert got[0] == _round9(1.0 / (1.0 + math.exp(-z0)))
    # pair 1: overlap 0, union 5, dlen 3, jacc 0
    z1 = _round9(DEFAULT_BIAS + w1 * 5 + w2 * 3)
    assert got[1] == _round9(1.0 / (1.0 + math.exp(-z1)))


def test_empty_and_null_text():
    q = pd.Series([None, "", "x"])
    d = pd.Series([None, "", "x"])
    feats = pair_features(q, d)
    # null/empty both tokenize to the empty set: all-zero features
    assert feats[0].tolist() == [0.0, 0.0, 0.0, 0.0]
    assert feats[1].tolist() == [0.0, 0.0, 0.0, 0.0]
    assert feats[2].tolist() == [1.0, 1.0, 1.0, 1.0]
    s = NumericScorer()
    got = s(q, d)
    base = _round9(1.0 / (1.0 + math.exp(-_round9(DEFAULT_BIAS))))
    assert got[0] == got[1] == base


def test_save_load_roundtrip(tmp_path):
    s = NumericScorer((0.1, 0.2, 0.3, 0.4), bias=-1.5)
    s.save(str(tmp_path / "w.json"))
    back = load_scorer(str(tmp_path / "w.json"))
    assert back == s
    q = pd.Series(["a b c"]); d = pd.Series(["b c d"])
    assert back(q, d) == s(q, d)


def test_slot_contract_in_rerank_plan(spark):
    """The scorer drops into rerank_topk's scorer= slot and changes the
    ranking criterion without touching the plan shape."""
    from tulflow_spark.ext.rerank import rerank_topk

    queries = spark.createDataFrame(
        [(1, "quick brown fox")], "query_id long, text string"
    )
    docs = spark.createDataFrame(
        [(10, "quick brown fox jumps"),
         (11, "quick brown"),
         (12, "unrelated words entirely")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12)], "query_id long, doc_id long"
    )
    out = rerank_topk(
        cands, queries, docs, "query_id", "doc_id", "text", "text",
        k=3, scorer=NumericScorer(),
    ).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # overlap-heavy doc wins; unrelated doc last
    assert ranked[0] == 10 and ranked[-1] == 12
    # scores are the hand recipe, 9-decimal rounded
    for r in out:
        assert r["score"] == _round9(r["score"])


def test_huge_low_overlap_doc_does_not_overflow():
    """Review finding r7: z < -709 previously raised OverflowError inside
    math.exp; the +/-50 clamp is value-identical after ROUND(...,9)."""
    q = pd.Series(["zz"])
    d = pd.Series([" ".join(f"w{i}" for i in range(20000))])
    s = NumericScorer()
    got = s(q, d)[0]
    assert got == 0.0  # sigmoid of a hugely negative z, 9-dec rounded
    # and a hugely positive z saturates to exactly 1.0
    s2 = NumericScorer((1.0, 0.0, 0.0, 0.0), bias=0.0)
    both = " ".join(f"w{i}" for i in range(2000))
    assert s2(pd.Series([both]), pd.Series([both]))[0] == 1.0
