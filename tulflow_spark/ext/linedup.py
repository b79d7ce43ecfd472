"""Exact line/paragraph-level deduplication (sub-document granularity).

Document-level dedup (ext.dedup) drops whole near-identical documents;
line-level dedup removes the duplicated *parts* — the boilerplate
headers, license blocks, and navigation chrome that recur verbatim
across millions of otherwise-distinct pages.  The canonical recipe
(exact substring/line dedup as in "Deduplicating Training Data Makes
Language Models Better", Lee et al. 2022, and CCNet's paragraph hashing)
is: split every document into lines, keep each distinct line only at its
FIRST occurrence in a deterministic corpus order, and drop every later
copy.

Scale shape (the whole point — this must survive 100 TB):

1. ``posexplode`` the per-document line array — a map-only pass, no
   Python, no shuffle;
2. first-occurrence resolution is ``groupBy(line).agg(min(struct(doc,
   idx)))`` — a map-side-combinable aggregate, so a line repeated in
   millions of documents contributes ONE row per map task to the
   shuffle, not millions (this is why it is NOT a window
   ``row_number() OVER (PARTITION BY line)``, which would sort every
   copy of a hot line on a single task);
3. a join of the exploded lines back to that keeper frame on the line
   key — 1:N with the aggregated side carrying one row per distinct
   line; AQE skew-join splits any residual hot key;
4. per-document reassembly: ``groupBy(doc).agg(sort collected (idx,
   line))`` — partitioned by document id, bounded by document size.

Two shuffles total (line key, then doc key), both on keys the data is
naturally sized by.

The corpus at hand has no newlines, so :func:`pseudo_lines` derives
deterministic fixed-width word-chunk "lines" — the same operator then
exercises end-to-end with a DuckDB oracle (``dd9_line_dedup``); real
newline/paragraph corpora pass ``lines_from_delimiter`` instead.

No reference analogue (tulflow moves records; it does not dedup text) —
LLM-pipeline extension alongside ext.dedup / ext.curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tulflow_spark.ext.text import tokens


def lines_from_delimiter(col: Column | str, delimiter: str = "\n") -> Column:
    """Split ``col`` into an array of lines on a literal delimiter.
    Blank lines are kept (they carry positional meaning for reassembly);
    an empty/blank document yields an empty array."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, F.lit(delimiter), -1)
    return F.when(
        F.coalesce(F.trim(c), F.lit("")) == "", F.array().cast("array<string>")
    ).otherwise(parts)


def pseudo_lines(col: Column | str, words_per_line: int = 8) -> Column:
    """Deterministic fixed-width word-chunk "lines" for corpora without
    newline structure: whitespace tokens grouped ``words_per_line`` at a
    time, each chunk re-joined with single spaces.  Chunk ``j`` covers
    tokens ``j*k+1 .. j*k+k`` (1-based), the last chunk may be short."""
    if words_per_line < 1:
        raise ValueError("words_per_line must be >= 1")
    toks = tokens(col)
    n = F.size(toks)
    k = F.lit(words_per_line)
    n_chunks = F.ceil(n / k).cast("int")
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda j: F.concat_ws(" ", F.slice(toks, j * k + 1, words_per_line)),
        )
    )


def dedup_lines(
    df: DataFrame,
    id_col: str,
    lines: Column,
    out_delimiter: str = "\n",
) -> DataFrame:
    """Corpus-wide exact line dedup, first occurrence wins.

    ``lines`` is an array<string> column expression over ``df`` (from
    :func:`lines_from_delimiter` or :func:`pseudo_lines`).  The corpus
    order is ``(id_col, line_index)`` — deterministic, so the same input
    always keeps the same copies.

    Returns one row per input document:
    ``id_col, n_lines BIGINT, n_kept BIGINT, text_dedup STRING`` where
    ``text_dedup`` is the surviving lines in original order re-joined
    with ``out_delimiter`` ('' when nothing survives).
    """
    base = df.select(id_col)
    exploded = df.select(id_col, F.posexplode(lines).alias("_li", "_line"))

    # Map-side-combinable first-occurrence: one row per distinct line.
    firsts = exploded.groupBy("_line").agg(
        F.min(F.struct(id_col, "_li")).alias("_first")
    )

    kept = exploded.join(firsts, "_line").withColumn(
        "_keep", F.struct(id_col, "_li") == F.col("_first")
    )

    agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        F.concat_ws(
            out_delimiter,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("_li", "_line"))
                    )
                ),
                lambda x: x["_line"],
            ),
        ).alias("text_dedup"),
    )

    # Documents whose line array was empty never reach the explode;
    # reattach them with zero counts so output is one row per input row.
    return (
        base.join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )
