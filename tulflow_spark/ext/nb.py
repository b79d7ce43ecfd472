"""Self-trained multinomial Naive-Bayes text classifier.

The trained-classifier quality-filter shape of modern LLM data pipelines
(fastText-style linear classifiers in DCLM / FineWeb-Edu): train a bag-of-
tokens model from in-corpus labels, score every document, filter or route
on the prediction.  No external model artifacts — the model is two
map-side-combinable aggregates over the corpus (token-class counts +
class totals), exactly like :mod:`tulflow_spark.ext.lm`'s bigram model,
and it broadcasts into the scoring join.

Two scorers, mirroring ``lm.bigram_score`` / ``lm.bigram_perplexity``:

- :func:`nb_scores` — **engine-exact** additive-probability variant: per
  class, the BIGINT sum of scaled Laplace-smoothed token probabilities
  ``floor((c(tok,y)+1)/(tot_y+V) * 1e9)`` plus the scaled class prior —
  the same floor-scaled-integer trick as ``ext.similarity``'s dot
  products (floor of a double is exact; integer sums are associative),
  so scores and predictions hash-match DuckDB under any partitioning.
- :func:`nb_log_scores` — the textbook log-space NB posterior
  (transcendental → float tolerance; the production scorer).

Scale shape: model size = vocabulary (bounded, broadcastable); scoring is
one broadcast join over exploded tokens + one per-document aggregate —
the document bodies shuffle zero times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tulflow_spark.ext.text import tokens


def _token_frame(df: DataFrame, id_col: str, text_col: str, label: F.Column):
    return df.select(
        F.col(id_col),
        label.cast("int").alias("_y"),
        F.explode(tokens(text_col)).alias("tok"),
    )


def nb_model(
    df: DataFrame, id_col: str, text_col: str, positive: F.Column
) -> tuple[DataFrame, DataFrame]:
    """Train: returns ``(per_token, scalars)``.

    ``per_token``: (tok, c_pos, c_all) — token occurrences per class.
    ``scalars``: one row (tot_pos, tot_all, v) — class token totals and
    vocabulary size.  Both are plain aggregates (partials map-side)."""
    toks = _token_frame(df, id_col, text_col, positive)
    per_token = toks.groupBy("tok").agg(
        F.sum("_y").cast("long").alias("c_pos"),
        F.count(F.lit(1)).alias("c_all"),
    )
    scalars = toks.agg(
        F.sum("_y").cast("long").alias("tot_pos"),
        F.count(F.lit(1)).alias("tot_all"),
        F.countDistinct("tok").alias("v"),
    )
    return per_token, scalars


def nb_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    positive: F.Column,
    broadcast_model: bool = True,
) -> DataFrame:
    """Engine-exact scores and prediction per document.

    Returns ``(id_col, s_pos, s_neg DOUBLE, pred BOOLEAN)`` where
    ``s_y = (prior_y + Σ_tok floor((c(tok,y)+1)/(tot_y+V) * 1e9)) / 1e9``
    — every addend an exact BIGINT (floor of a double is exact and
    engine-identical; integer sums are associative), so the comparison
    ``s_pos > s_neg`` is deterministic across engines and partitionings.
    Documents with no tokens in the vocabulary drop (the same inner-join
    semantics as ``lm.bigram_score``)."""
    scale = F.lit(1_000_000_000.0)
    per_token, scalars = nb_model(df, id_col, text_col, positive)
    terms = per_token.crossJoin(F.broadcast(scalars)).select(
        "tok",
        F.floor(
            (F.col("c_pos") + 1).cast("double")
            / (F.col("tot_pos") + F.col("v")).cast("double")
            * scale
        )
        .cast("long")
        .alias("t_pos"),
        F.floor(
            (F.col("c_all") - F.col("c_pos") + 1).cast("double")
            / (F.col("tot_all") - F.col("tot_pos") + F.col("v")).cast("double")
            * scale
        )
        .cast("long")
        .alias("t_neg"),
    )
    if broadcast_model:
        terms = F.broadcast(terms)
    toks = _token_frame(df, id_col, text_col, positive)
    priors = df.agg(
        F.floor(
            F.sum(positive.cast("int")).cast("double")
            / F.count(F.lit(1))
            * scale
        )
        .cast("long")
        .alias("p_pos"),
        F.floor(
            F.sum((~positive).cast("int")).cast("double")
            / F.count(F.lit(1))
            * scale
        )
        .cast("long")
        .alias("p_neg"),
    )
    doc = (
        toks.join(terms, "tok")
        .groupBy(id_col)
        .agg(
            F.sum("t_pos").alias("_sp"),
            F.sum("t_neg").alias("_sn"),
        )
    )
    return doc.crossJoin(F.broadcast(priors)).select(
        id_col,
        ((F.col("_sp") + F.col("p_pos")) / scale).alias("s_pos"),
        ((F.col("_sn") + F.col("p_neg")) / scale).alias("s_neg"),
        ((F.col("_sp") + F.col("p_pos")) > (F.col("_sn") + F.col("p_neg"))).alias(
            "pred"
        ),
    )


def nb_log_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    positive: F.Column,
    broadcast_model: bool = True,
) -> DataFrame:
    """Textbook NB log posterior (float): ``log P(y) + Σ log P(tok|y)``
    with Laplace smoothing — the production scorer; use :func:`nb_scores`
    where hash-exact parity is required."""
    per_token, scalars = nb_model(df, id_col, text_col, positive)
    terms = per_token.crossJoin(F.broadcast(scalars)).select(
        "tok",
        F.log(
            (F.col("c_pos") + 1).cast("double")
            / (F.col("tot_pos") + F.col("v")).cast("double")
        ).alias("l_pos"),
        F.log(
            (F.col("c_all") - F.col("c_pos") + 1).cast("double")
            / (F.col("tot_all") - F.col("tot_pos") + F.col("v")).cast("double")
        ).alias("l_neg"),
    )
    if broadcast_model:
        terms = F.broadcast(terms)
    toks = _token_frame(df, id_col, text_col, positive)
    # Laplace-smoothed priors ((c+1)/(n+2)): a single-class corpus must
    # yield a finite (strongly skewed) prior, not log(0) = NULL for every
    # document
    priors = df.agg(
        F.log(
            (F.sum(positive.cast("int")) + 1).cast("double")
            / (F.count(F.lit(1)) + 2)
        ).alias("lp_pos"),
        F.log(
            (F.sum((~positive).cast("int")) + 1).cast("double")
            / (F.count(F.lit(1)) + 2)
        ).alias("lp_neg"),
    )
    doc = (
        toks.join(terms, "tok")
        .groupBy(id_col)
        .agg(
            F.sum("l_pos").alias("_sp"),
            F.sum("l_neg").alias("_sn"),
        )
    )
    return doc.crossJoin(F.broadcast(priors)).select(
        id_col,
        (F.col("_sp") + F.col("lp_pos")).alias("log_pos"),
        (F.col("_sn") + F.col("lp_neg")).alias("log_neg"),
        (
            (F.col("_sp") + F.col("lp_pos")) > (F.col("_sn") + F.col("lp_neg"))
        ).alias("pred"),
    )


__all__ = ["nb_model", "nb_scores", "nb_log_scores"]
