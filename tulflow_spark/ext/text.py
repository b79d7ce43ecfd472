"""Text-analysis operators over a document corpus.

All hot-path expressions are built-in Spark SQL functions (JVM, whole-stage
codegen) — no Python in the loop.  At 100 TB these are embarrassingly
parallel map-only passes; the only shuffles are the final small rollups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword lists per language for the n-gram language heuristic
# and quality scoring.  Deliberately small + deterministic (shared verbatim
# with the DuckDB oracle SQL).
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "that")
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "de": ("der", "und", "das"),
    "es": ("el", "los", "que"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty string → empty array (not [''])."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: word runs plus individual punctuation marks
    (a cheap deterministic proxy for BPE tokenizers).  Expressed as a
    lookaround-free regex so the same formula runs on RE2 engines too."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"\w+|[^\w\s]"), F.lit(0)))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens(col)
    hits = F.filter(toks, lambda t: F.lower(t).isin(*stopwords))
    return F.when(F.size(toks) > 0, F.size(hits) / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0, 1]: rewards stopword presence and
    moderate length, penalizes punctuation soup.  Pure column algebra."""
    c = F.col(col) if isinstance(col, str) else col
    length_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 5, F.lit(1.0))
    return (length_term + stop_term + punct_term) / 3


def predict_lang(col: Column | str) -> Column:
    """Marker-word language ID: count marker hits per language, argmax with a
    deterministic tie-break on language code; 'und' when nothing matches."""
    toks_lower = F.transform(tokens(col), F.lower)
    scores = [
        F.struct(
            F.size(F.filter(toks_lower, lambda t: t.isin(*markers))).alias("hits"),
            # negate for argmax-with-min-code tiebreak via array_max on
            # (hits, reversed-code) — instead keep it simple: max by
            # (hits, code desc) ordering below.
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))  # struct compare: hits then lang
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(col: Column | str, n_chars: int = 64) -> Column:
    """Deterministic document fingerprint: md5 of the first+last ``n_chars``
    of the whitespace-normalized text — a cheap rolling-hash-style signature
    robust to internal edits at the margins."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(c, r"\s+", " "))
    head = F.substring(norm, 1, n_chars)
    tail = F.substring(F.reverse(norm), 1, n_chars)
    return F.md5(F.concat(head, F.lit("|"), tail).cast("binary"))


def ngrams(col: Column | str, n: int) -> Column:
    """Positional word n-grams (space-joined), trailing partials dropped."""
    toks = tokens(col)
    grams = toks
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, i + 1, F.size(toks)),
            lambda g, t: F.concat(g, F.lit(" "), t),
        )
    return F.filter(grams, lambda g: g.isNotNull())


# --- PII scrubbing -----------------------------------------------------------
# Deterministic, regex-only redaction — pure column algebra, no Python in the
# loop.  Patterns are deliberately conservative (high precision); swap in a
# model-backed NER pass via mapInPandas when recall matters more.

# Phone numbers must show real phone STRUCTURE, not just "9+ digits with
# separators" (the r3 pattern matched ISBNs and year ranges):
#   1. +country prefix, then 3-17 more digits in 2-5 groups — the '+' is the
#      structural signal;
#   2. (area) local style: (nnn) nnn-nnnn;
#   3. bare 10-digit 3-3-4 grouping with explicit separators.
# ISBN-10/13 (group sizes 1/3/5), year ranges (two 4-digit groups), decimals
# and dates all fail the group-size shapes; precision pinned in test_pii.py.
_PHONE = (
    r"\+\d{1,3}[-. ]?\(?\d{1,4}\)?(?:[-. ]?\d{2,4}){1,4}"
    r"|\(\d{3}\)[-. ]?\d{3}[-. ]\d{4}"
    r"|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
)

PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[\w.+-]+@[\w-]+(\.[\w-]+)+"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b"),
    ("phone", _PHONE),
)


def redact_pii(
    col: Column | str, patterns: tuple[tuple[str, str], ...] = PII_PATTERNS
) -> Column:
    """Replace each PII match with an uppercase ``[KIND]`` placeholder."""
    c = F.col(col) if isinstance(col, str) else col
    for kind, pat in patterns:
        c = F.regexp_replace(c, pat, f"[{kind.upper()}]")
    return c


def mask_digits(col: Column | str, repl: str = "X") -> Column:
    """Blanket digit masking (account numbers, ids embedded in names)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[0-9]", repl)


def pseudonymize(col: Column | str, salt: str = "") -> Column:
    """Deterministic keyed pseudonym: same input → same token, so joins and
    group-bys on the pseudonym still work after scrubbing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(salt), c).cast("binary"))


# --- Repetition filters (Gopher/C4-style) ------------------------------------


def repetition_profile(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document repetition metrics as exact parts-per-million integers
    (integer arithmetic → bit-identical across engines and partitionings):

    - ``dup_token_ppm``: 1 - distinct/total tokens
    - ``dup_bigram_ppm``: 1 - distinct/total word bigrams
    - ``top_token_ppm``: frequency of the single most common token
    - ``keep``: Gopher-style gate (top token < 30%, dup bigrams < 20%)

    Shape at 100 TB: the bigram metrics are per-row column algebra; the
    top-token count needs one explode + (id, token) partial-aggregated
    shuffle — the same cost as a word-count, no corpus-wide state.  Empty
    documents are excluded (metrics undefined).
    """
    toks = tokens(text_col)
    bi = ngrams(text_col, 2)
    row_side = df.filter(F.size(toks) > 0).select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("_n_distinct"),
        F.size(bi).cast("bigint").alias("_n_bi"),
        F.size(F.array_distinct(bi)).cast("bigint").alias("_n_bi_distinct"),
    )
    top = (
        df.select(F.col(id_col), F.explode(toks).alias("_tok"))
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col)
        .agg(F.max("_cnt").cast("bigint").alias("_top_cnt"))
    )
    j = row_side.join(top, id_col)
    dup_token = F.expr("CAST(1000000 * (n_tokens - _n_distinct) DIV n_tokens AS BIGINT)")
    dup_bigram = F.when(
        F.col("_n_bi") > 0,
        F.expr("CAST(1000000 * (_n_bi - _n_bi_distinct) DIV _n_bi AS BIGINT)"),
    ).otherwise(F.lit(0).cast("bigint"))
    top_token = F.expr("CAST(1000000 * _top_cnt DIV n_tokens AS BIGINT)")
    return j.select(
        id_col,
        "n_tokens",
        dup_token.alias("dup_token_ppm"),
        dup_bigram.alias("dup_bigram_ppm"),
        top_token.alias("top_token_ppm"),
        (
            (top_token < 300_000) & (dup_bigram < 200_000)
        ).alias("keep"),
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document profile used by the rollup queries."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        stopword_ratio(c).alias("stop_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        predict_lang(c).alias("pred_lang"),
        doc_fingerprint(c).alias("fingerprint"),
    )


def rarity_terms(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF shape with a
    LINEAR idf: ``score = tf * round(N/df, 9)`` (the classic ``log`` idf
    is transcendental and would break hash-exact cross-engine parity; the
    linear ratio ranks identically for fixed tf).

    Output: ``(id, term, tf BIGINT, score DOUBLE, rank BIGINT)``, rank
    1..k per document ordered by score desc then term asc (deterministic
    ties).

    Scale shape: token explode is map-only; the (doc, term) tf aggregate
    and the vocabulary-sized document-frequency aggregate are both
    map-side combinable; idf joins back via broadcast (vocabulary ≪
    corpus — swap for a shuffle join past ~100M distinct terms); the
    final window sorts only within one document's distinct terms.
    """
    terms = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("_nd"))

    from pyspark.sql import Window

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.round(F.col("_nd").cast("double") / F.col("df").cast("double"), 9),
                9,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", out_col: str = "zlib_ratio"
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic cheap repetitiveness signal (low ratio ⇒ highly repetitive /
    templated text; near-1 ⇒ high-entropy or random).  Complements the
    token-level Gopher/C4 repetition filters (:func:`repetition_profile`)
    with a tokenizer-free, language-agnostic view.

    Arrow-batched ``pandas_udf`` calling C zlib per row (stdlib, level 6);
    SQL engines have no zlib, so this op is pytest-pinned (monotonicity,
    bounds), not oracle-paired.  Empty text gets ratio NULL."""
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them
    # and pandas_udf rejects string signatures; hint-less = scalar form
    @pandas_udf("double")
    def ratio(s):
        return s.map(
            lambda t: (
                len(zlib.compress(t.encode("utf-8"), 6)) / len(t.encode("utf-8"))
                if t
                else None
            )
        )

    return df.withColumn(out_col, ratio(F.col(text_col)))
