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
