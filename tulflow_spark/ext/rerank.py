"""Candidate re-ranking: the second stage of a retrieval pipeline — an
ANN pass (ext.ivf / ext.ivfpq / ext.similarity) produces N candidates per
query cheaply, then a pairwise scorer reads BOTH texts and re-orders the
candidates to a final top-k.  In production the scorer is a cross-encoder
model; the Spark-side plumbing (pair assembly, Arrow batch shapes, per-
query top-k) is identical whichever scorer runs, so that plumbing is real
and tested here while the model slot is pluggable.

Scale shape:

- Pair assembly joins candidate ids to the (small) query table by
  broadcast and to the corpus by doc id — the corpus-side join is the
  one shuffle, sized by the candidate list (#queries × N), never by the
  corpus.
- Scoring is an iterator-style Arrow-batched ``pandas_udf`` — the model
  slot: batches arrive as (query_text, doc_text) series pairs, exactly
  the shape a cross-encoder forward pass consumes.  The default scorer
  is a DETERMINISTIC lexical token-set Jaccard (regex-tokenized like
  ext.text.tokens, so any SQL engine can audit a verdict); a real model
  drops in as ``scorer=`` without touching the plan.
- Top-k is a window partitioned by query id (parallelism = #queries,
  each sort bounded by N candidates) with (score desc, doc id) ordering
  so ties break deterministically.

``model_cross_encoder`` is the typed wall for the real thing: it names
the dependency (torch/transformers, absent in this container) instead of
silently degrading.

No reference-repo analogue; LLM-pipeline extension surface beside
ext.similarity and ext.ivfpq.
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WS = re.compile(r"\s+")


def _tokset(v) -> set:
    # NULL text arrives as None (object dtype) or NaN (float dtype) —
    # both are the empty token set, NOT the literal tokens 'None'/'nan'
    # (which would score two null docs 1.0); matches tokens(NULL) → 0.0
    # on the JVM lexical path
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return set()
    s = str(v).strip()
    return set(_WS.split(s)) if s else set()


def token_jaccard_scorer(q: pd.Series, d: pd.Series) -> list[float]:
    """Deterministic lexical scorer: Jaccard over distinct whitespace
    tokens (tokenization mirrors ext.text.tokens / the oracle's
    string_split_regex — empty or NULL text → empty set, score 0)."""
    out = []
    for a, b in zip(q, d):
        ta, tb = _tokset(a), _tokset(b)
        u = len(ta | tb)
        out.append(len(ta & tb) / u if u else 0.0)
    return out


def model_cross_encoder(*_args, **_kwargs):
    """The production scorer slot: a cross-encoder forward pass over
    (query, doc) text batches.  Requires torch + transformers, which this
    container does not ship — typed wall, not a silent fallback.  The
    same slot hosts working dependency-free models today:
    ext/numeric_scorer (JSON weights, logistic) and ext/onnx_mini
    (real .onnx files through a stdlib protobuf walker + numpy op
    registry — rr4's driver-gated path)."""
    raise NotImplementedError(
        "cross-encoder scoring requires torch/transformers; pass a "
        "scorer= callable (batch: pd.Series, pd.Series -> list[float]) "
        "wrapping your model — e.g. ext.onnx_mini.load_onnx_scorer(path) "
        "for a small ONNX MLP"
    )


def cross_score(
    pairs: DataFrame,
    q_text_col: str,
    d_text_col: str,
    scorer: Callable[[pd.Series, pd.Series], list[float]] | None = None,
    out_col: str = "score",
) -> DataFrame:
    """Score (query_text, doc_text) pairs with an Arrow-batched scorer.
    The UDF is iterator-style so a model scorer amortizes per-executor
    initialization across batches."""
    fn = scorer or token_jaccard_scorer

    @F.pandas_udf("double")
    def _score(
        it: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        for q, d in it:
            yield pd.Series(fn(q, d), dtype="float64")

    return pairs.withColumn(
        out_col, _score(F.col(q_text_col), F.col(d_text_col))
    )


def rerank_topk(
    candidates: DataFrame,
    queries: DataFrame,
    docs: DataFrame,
    query_id_col: str,
    doc_id_col: str,
    q_text_col: str,
    d_text_col: str,
    k: int = 10,
    scorer: Callable[[pd.Series, pd.Series], list[float]] | None = None,
) -> DataFrame:
    """Re-rank ``candidates`` (query_id, doc_id[, ...]) to the top ``k``
    per query by pairwise score.  Returns (query_id, doc_id, score, rank)
    with rank 1..k, ties broken by doc id."""
    pairs = candidates.select(query_id_col, doc_id_col).join(
        F.broadcast(
            queries.select(
                F.col(query_id_col),
                F.col(q_text_col).alias("_q_text"),
            )
        ),
        query_id_col,
    ).join(
        docs.select(
            F.col(doc_id_col), F.col(d_text_col).alias("_d_text")
        ),
        doc_id_col,
    )
    scored = cross_score(pairs, "_q_text", "_d_text", scorer)
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(doc_id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(query_id_col, doc_id_col, "score", "rank")
    )


def lexical_rerank_topk(
    candidates: DataFrame,
    queries: DataFrame,
    docs: DataFrame,
    query_id_col: str,
    doc_id_col: str,
    q_text_col: str,
    d_text_col: str,
    k: int = 10,
) -> DataFrame:
    """:func:`rerank_topk` with the lexical scorer computed ENTIRELY in
    the JVM (distinct-token arrays + array_intersect Jaccard — identical
    scores to token_jaccard_scorer, bit for bit): the fast path when the
    re-rank criterion really is lexical and no model is involved.
    Measured 3.0x the Python-slot wall at 3.6M pairs (118 -> 39 s on
    local[32] — pair-assembly shuffle dominates both paths; the scoring
    stage itself is where the factor lives)."""
    from tulflow_spark.ext.dedup import jaccard
    from tulflow_spark.ext.text import tokens

    pairs = candidates.select(query_id_col, doc_id_col).join(
        F.broadcast(
            queries.select(
                F.col(query_id_col),
                F.array_distinct(tokens(q_text_col)).alias("_tq"),
            )
        ),
        query_id_col,
    ).join(
        docs.select(
            F.col(doc_id_col),
            F.array_distinct(tokens(d_text_col)).alias("_td"),
        ),
        doc_id_col,
    )
    scored = pairs.withColumn(
        "score", jaccard(F.col("_tq"), F.col("_td"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(doc_id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(query_id_col, doc_id_col, "score", "rank")
    )


__all__ = [
    "cross_score",
    "lexical_rerank_topk",
    "model_cross_encoder",
    "rerank_topk",
    "token_jaccard_scorer",
]
