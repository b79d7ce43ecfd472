"""Semantics of line-level dedup (ext.linedup) and bigram-LM scoring
(ext.lm) on crafted corpora — the oracle-parity test covers the registered
queries; these pin the operator contracts directly."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tulflow_spark.ext.lm import bigram_model, bigram_perplexity, bigram_score
from tulflow_spark.ext.linedup import (
    dedup_lines,
    lines_from_delimiter,
    pseudo_lines,
)


def _rows(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


class TestLineDedup:
    def test_first_occurrence_wins_across_docs(self, spark):
        df = spark.createDataFrame(
            [
                (1, "intro\nCOMMON LICENSE\nbody one"),
                (2, "COMMON LICENSE\nbody two"),
                (3, "body three\nCOMMON LICENSE"),
            ],
            ["doc_id", "text"],
        )
        out = _rows(
            dedup_lines(df, "doc_id", lines_from_delimiter("text")), "doc_id"
        )
        # doc 1 saw the license first: keeps all three lines
        assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
        assert out[1]["text_dedup"] == "intro\nCOMMON LICENSE\nbody one"
        # later docs lose exactly the duplicated line, order preserved
        assert out[2]["n_kept"] == 1 and out[2]["text_dedup"] == "body two"
        assert out[3]["n_kept"] == 1 and out[3]["text_dedup"] == "body three"

    def test_duplicate_within_one_doc(self, spark):
        df = spark.createDataFrame([(1, "x\ny\nx")], ["doc_id", "text"])
        out = _rows(
            dedup_lines(df, "doc_id", lines_from_delimiter("text")), "doc_id"
        )
        assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
        assert out[1]["text_dedup"] == "x\ny"

    def test_empty_document_round_trips(self, spark):
        df = spark.createDataFrame([(1, ""), (2, "a")], ["doc_id", "text"])
        out = _rows(
            dedup_lines(df, "doc_id", lines_from_delimiter("text")), "doc_id"
        )
        assert out[1] == {
            "doc_id": 1,
            "n_lines": 0,
            "n_kept": 0,
            "text_dedup": "",
        }
        assert out[2]["n_kept"] == 1

    def test_pseudo_lines_chunking(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "  "), (3, "a b")], ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: r["ls"]
            for r in df.select(
                "doc_id", pseudo_lines("text", 2).alias("ls")
            ).collect()
        }
        assert got[1] == ["a b", "c d", "e"]  # short trailing chunk kept
        assert got[2] == []
        assert got[3] == ["a b"]

    def test_pseudo_lines_rejects_bad_width(self):
        with pytest.raises(ValueError):
            pseudo_lines("text", 0)


class TestBigramLM:
    def test_model_counts(self, spark):
        # corpus: "a b a b" + "a b" -> bigrams ab,ba,ab | ab
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b")], ["doc_id", "text"]
        )
        m = {
            (r["w1"], r["w2"]): (r["c_big"], r["c_ctx"])
            for r in bigram_model(df, "doc_id", "text").collect()
        }
        assert m[("a", "b")] == (3, 3)  # p(b|a) = 1
        assert m[("b", "a")] == (1, 1)  # p(a|b) = 1

    def test_score_hand_computed(self, spark):
        # corpus: doc1 "a b c", doc2 "a b d"
        # bigram counts: ab:2  bc:1  bd:1 ; contexts: a.:2  b.:2
        # doc1 terms: ab -> 2/2 = 1.0, bc -> 2/1 = 2.0  => sum 3.0
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b d")], ["doc_id", "text"]
        )
        out = _rows(bigram_score(df, "doc_id", "text"), "doc_id")
        assert out[1]["n_bigrams"] == 2
        assert out[1]["sum_inv_p"] == pytest.approx(3.0)
        assert out[2]["sum_inv_p"] == pytest.approx(3.0)

    def test_short_docs_drop_out(self, spark):
        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, "a b")], ["doc_id", "text"]
        )
        out = _rows(bigram_score(df, "doc_id", "text"), "doc_id")
        assert set(out) == {3}
        assert out[3]["n_bigrams"] == 1

    def test_external_model_scoring(self, spark):
        train = spark.createDataFrame(
            [(1, "a b c"), (2, "a b d")], ["doc_id", "text"]
        )
        m = bigram_model(train, "doc_id", "text")
        probe = spark.createDataFrame(
            [(10, "a b"), (11, "q z")], ["doc_id", "text"]
        )
        out = _rows(bigram_score(probe, "doc_id", "text", model=m), "doc_id")
        assert out[10]["sum_inv_p"] == pytest.approx(1.0)  # p(b|a)=1
        assert 11 not in out  # out-of-model bigrams drop

    def test_perplexity_geometric(self, spark):
        # doc1 "a b c": p(b|a)=1, p(c|b)=1/2 -> ppl = 2^(mean(0,1)) = sqrt(2)
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b d")], ["doc_id", "text"]
        )
        out = _rows(bigram_perplexity(df, "doc_id", "text"), "doc_id")
        assert out[1]["perplexity"] == pytest.approx(math.sqrt(2.0), rel=1e-9)

    def test_predictable_text_scores_lower(self, spark):
        df = spark.createDataFrame(
            [(1, "x y " * 50), (2, "a b a c a d a e a f a g a h a i a j")],
            ["doc_id", "text"],
        )
        out = _rows(bigram_score(df, "doc_id", "text"), "doc_id")
        mean1 = out[1]["sum_inv_p"] / out[1]["n_bigrams"]
        mean2 = out[2]["sum_inv_p"] / out[2]["n_bigrams"]
        assert mean1 < mean2
