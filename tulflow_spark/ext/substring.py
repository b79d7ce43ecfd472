"""Exact substring deduplication: find every span of ≥ n tokens that occurs
more than once across the corpus (the "exact substring dedup" of Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better" — public
algorithm; their suffix-array formulation is single-machine, this is the
distributed windowed-hash equivalent with identical output semantics for
fixed n).

Spark shaping (100 TB stance):

- tokenize once, build the n-token rolling windows as a JVM higher-order
  ``transform`` over ``sequence`` (no UDF), hash each window (md5 — also
  expressible in the DuckDB oracle);
- repeated-window detection is a map-side-combinable ``groupBy(hash)``
  count: only (hash, doc, pos) triples shuffle, never text;
- qualifying window *starts* flow into a per-document interval merge
  (classic lag/cummax/flag-sum — a doc-partitioned window, no global
  sort) producing maximal repeated spans.

Output: one row per maximal span ``(doc_id, span_start, span_end,
n_windows)`` where positions are 0-based token indices and ``span_end`` is
exclusive.  A curation pipeline cuts these spans out (or drops the doc if
coverage is high) — policy stays with the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _window_hashes(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc, pos, window-hash) for every n-token rolling window.

    O(tokens × n) string building + one md5 per window make this the
    expensive map stage of the span plans; widen the input so it runs at
    cluster width instead of inheriting a narrow scan (no-op when the
    scan already splits)."""
    from tulflow_spark.io import widen

    docs = widen(docs)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    wins = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.md5(F.array_join(F.slice(toks, i + 1, n), " ")),
    )
    return (
        docs.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias("doc_id"), F.posexplode(wins).alias("pos", "h"))
    )


def repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Maximal token spans whose every n-window occurs ≥ ``min_count``
    times corpus-wide."""
    wh = _window_hashes(docs, id_col, text_col, n)
    hot = (
        wh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("h")
    )
    # qualifying starts; interval [pos, pos+n) per window
    starts = wh.join(hot, "h", "left_semi").select(
        "doc_id", F.col("pos").alias("s"), (F.col("pos") + n).alias("e")
    )
    w_order = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = starts.withColumn(
        "new_span", (F.col("s") > F.coalesce(prev_max_e, F.lit(-1))).cast("int")
    ).withColumn(
        "span_id",
        F.sum("new_span").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy("doc_id", "span_id")
        .agg(
            F.min("s").cast("bigint").alias("span_start"),
            F.max("e").cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("span_id")
    )


def repeated_spans_sql(
    n: int = 10, min_count: int = 2, source: str = "documents"
) -> str:
    """DuckDB oracle mirroring :func:`repeated_spans` over ``source``
    (any relation/CTE name with (doc_id, text))."""
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM {source}
    ),
    wins AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(t[i:i+{n}-1], ' ')) AS h
      FROM toks, UNNEST(range(1, len(t) - {n} + 2)) AS r(i)
      WHERE len(t) >= {n}
    ),
    hot AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= {min_count}
    ),
    starts AS (
      SELECT doc_id, pos AS s, pos + {n} AS e
      FROM wins WHERE h IN (SELECT h FROM hot)
    ),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
               PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), -1) THEN 1 ELSE 0 END AS new_span
      FROM starts
    ),
    spans AS (
      SELECT doc_id, s, e,
             SUM(new_span) OVER (
               PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS span_id
      FROM flagged
    )
    SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
           COUNT(*) AS n_windows
    FROM spans GROUP BY doc_id, span_id
    """


def cut_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every repeated span from the documents (keep-first is the
    caller's policy choice upstream — this removes ALL qualifying spans,
    the Lee et al. 'dedup both copies' variant).

    Output: (doc_id, text) with surviving tokens re-joined by single
    spaces.  Shaping: spans per doc are collected into an array via
    groupBy (span-count-sized), then token filtering is a JVM ``filter``
    over positions — no Python, text shuffles once for the span join.
    """
    from tulflow_spark.io import widen

    # the span list is span-count-sized (broadcast side), so the join
    # keeps the docs side's partitioning — widen it or the per-token
    # filter below runs at the (possibly single-split) scan width
    docs = widen(docs)
    agg = spans.groupBy(F.col(id_col)).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    kept = F.filter(
        F.zip_with(
            toks,
            F.sequence(F.lit(0), F.size(toks) - 1),
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        lambda p: ~F.exists(
            "_spans",
            lambda s: (p["i"] >= s["span_start"]) & (p["i"] < s["span_end"]),
        ),
    )
    return (
        docs.join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.when(
                F.col("_spans").isNull(), F.trim(F.col(text_col))
            )
            .otherwise(
                F.array_join(F.transform(kept, lambda p: p["t"]), " ")
            )
            .alias("text"),
        )
    )
