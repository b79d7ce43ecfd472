"""Corpus-trained bigram language-model scoring (perplexity filtering).

Every production LLM data pipeline runs an LM-based quality filter
(CCNet's KenLM perplexity buckets; Gopher/RefinedWeb variants): score
each document by how predictable its text is under a language model and
drop/bucket the tails.  External model artifacts don't exist in this
container, so the model here is the classic *self-trained* MLE bigram
model: train counts on the corpus being scored (two map-side-combinable
aggregates), then score each document against them.  Because the model
is trained on the same corpus, every scored bigram has a nonzero count —
MLE needs no smoothing and the scores are exactly reproducible by any
SQL engine.

Two scores:

* :func:`bigram_score` — per-document **sum of inverse conditional
  probabilities** ``sum(c(w1·)/c(w1 w2))`` plus the bigram count.  The
  arithmetic-mean analogue of perplexity (each term is the local
  branching factor), chosen as the ORACLE-GATED surface because it is
  hash-exact across engines: each term is one IEEE double division of
  two bigints (correctly rounded everywhere), rounded to 9 decimals,
  then summed as DECIMAL (associative, order-insensitive).
* :func:`bigram_perplexity` — the true geometric version
  ``2^(-mean log2 p)``; transcendental, so cross-engine equality is
  approximate — pytest-verified with tolerance, not oracle-hashed.

Scale shape at 100 TB:

1. bigram explode is a map-only pass (array ops, no Python);
2. model = ``groupBy(w1, w2).count`` then ``groupBy(w1).sum`` — both
   map-side combinable; the result is vocabulary-sized (millions of
   rows), orders of magnitude smaller than the corpus;
3. scoring joins the exploded bigrams to the model — broadcast when the
   model fits (the default here), else a shuffle join on ``(w1, w2)``
   where AQE splits hot function-word keys;
4. the per-document rollup shuffles only ``(doc_id, term)`` pairs.

No reference analogue — LLM-pipeline extension alongside ext.text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tulflow_spark.ext.text import tokens


def bigrams(col: Column | str) -> Column:
    """``array<struct<w1,w2>>`` of adjacent whitespace-token pairs;
    documents with fewer than two tokens yield an empty array."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
    )


def _exploded_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # tokenize + zip_with + explode is the expensive map stage of every
    # LM plan: run it at cluster width even off a single-split scan
    # (widen is a no-op when the scan already splits)
    from tulflow_spark.io import widen

    df = widen(df)
    return df.select(
        id_col, F.explode(bigrams(text_col)).alias("_bg")
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))


def bigram_model(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """MLE bigram counts over the corpus:
    ``(w1, w2, c_big BIGINT, c_ctx BIGINT)`` where ``c_big`` is the
    corpus frequency of the pair and ``c_ctx = sum(c_big) over w1`` the
    frequency of the context.  ``c_big/c_ctx`` is the MLE conditional
    probability p(w2|w1)."""
    bg = _exploded_bigrams(df, id_col, text_col)
    big_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    ctx_counts = big_counts.groupBy("w1").agg(F.sum("c_big").alias("c_ctx"))
    return big_counts.join(F.broadcast(ctx_counts), "w1")


def bigram_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document inverse-probability score under the bigram model.

    Returns ``(id_col, n_bigrams BIGINT, sum_inv_p DOUBLE)`` where
    ``sum_inv_p = sum over document bigrams of round(c_ctx/c_big, 9)``
    (DECIMAL-summed — order-insensitive).  ``sum_inv_p / n_bigrams`` is
    the mean local branching factor: low = repetitive/predictable text,
    high = incoherent token soup; both tails are filter candidates.

    Pass a pre-trained ``model`` (from :func:`bigram_model`, possibly on
    a reference corpus) to score against it; bigrams absent from the
    model are ignored (their ``n_bigrams`` row drops via the inner
    join).  Default trains on ``df`` itself, where coverage is total.
    """
    bg = _exploded_bigrams(df, id_col, text_col)
    m = model if model is not None else bigram_model(df, id_col, text_col)
    m = m.select("w1", "w2", "c_big", "c_ctx")
    if broadcast_model:
        m = F.broadcast(m)
    term = F.round(
        F.col("c_ctx").cast("double") / F.col("c_big").cast("double"), 9
    )
    return (
        bg.join(m, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(term.cast("decimal(30,9)"))
            .cast("double")
            .alias("sum_inv_p"),
        )
    )


def bigram_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """True geometric perplexity ``2^(-mean log2 p(w2|w1))`` per
    document (transcendental — reproducible only to float tolerance;
    use :func:`bigram_score` where hash-exact parity is required)."""
    bg = _exploded_bigrams(df, id_col, text_col)
    m = model if model is not None else bigram_model(df, id_col, text_col)
    m = m.select("w1", "w2", "c_big", "c_ctx")
    if broadcast_model:
        m = F.broadcast(m)
    log2p = F.log2(F.col("c_big").cast("double") / F.col("c_ctx").cast("double"))
    return (
        bg.join(m, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.pow(F.lit(2.0), -F.avg(log2p)).alias("perplexity"),
        )
    )
