"""Corpus curation: the composed clean→dedup pipeline a training-data run
applies to raw documents, built from the primitive operators.

- :func:`boilerplate_ngrams`: shingles appearing across many documents
  (header/footer/license boilerplate detection — the document-frequency
  inverse of near-dup detection).
- :func:`curate_exact`: quality-gate + exact dedup, fully deterministic and
  oracle-checkable.
- :func:`curate_near_dup`: the production composition — quality gate, exact
  dedup, then MinHash-LSH near-dup removal keeping the lowest id per
  near-dup cluster (greedy by id: deterministic, one pass over pairs).

Scale: each step is a bounded-shuffle primitive documented in DESIGN.md §4;
the composition adds no new shuffles beyond its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tulflow_spark.ext.dedup import exact_dedup, minhash_lsh_pairs, word_shingles
from tulflow_spark.ext.text import quality_score


def _materialize(df: DataFrame) -> DataFrame:
    """localCheckpoint a shared pipeline stage so downstream references
    read its blocks instead of re-deriving the whole upstream subtree.

    Catalyst performs no common-subtree sharing across self-joins: a
    frame consumed by k branches is COMPUTED k times, so a composed
    pipeline that gates+dedups once and then fans out (line dedup,
    metadata join, sampling, packing) re-scans the corpus and re-runs
    the gate for every branch (the cur4 before-plan carried 48 scans of
    the documents table).  ``localCheckpoint`` is the sanctioned
    materialization (ext.components precedent): unlike ``persist`` it
    needs no caller-side unpersist — blocks are dropped by the
    ContextCleaner when the returned frame is garbage collected."""
    return df.localCheckpoint(eager=True)


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_doc_frequency: int = 3,
) -> DataFrame:
    """Shingles occurring in >= min_doc_frequency distinct documents:
    (gram, doc_frequency).  At scale this list feeds a broadcast filter that
    strips boilerplate before modeling."""
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, n).alias("_sh")
    )
    return (
        sh.select(F.explode("_sh").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_frequency"))
        .filter(F.col("doc_frequency") >= min_doc_frequency)
    )


def strip_boilerplate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_doc_frequency: int = 3,
    out_col: str = "clean_text",
) -> DataFrame:
    """Sub-document dedup: remove every token covered by a high-document-
    frequency n-gram (header/footer/license boilerplate), keeping the rest
    of the document intact.

    Shape at 100 TB: the hot-gram list is the (small) output of
    :func:`boilerplate_ngrams` and is BROADCAST; per document the only work
    is one positional-gram projection, a broadcast semi-join, and an array
    filter — no shuffle of document bodies, and the gram rollup itself is the
    same one dd6 already materializes (compute once, reuse).

    Returns the input rows plus ``out_col`` (tokens joined by single
    spaces; fully-stripped documents become the empty string).
    """
    hot = boilerplate_ngrams(
        df, id_col, text_col, n, min_doc_frequency
    ).select("gram")

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # positional (non-distinct) grams: grams[p] covers tokens p..p+n-1
    # (0-based); trailing positions null-pad and never match a hot gram
    grams = toks
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, i + 1, F.size(toks)),
            lambda g, t: F.concat(g, F.lit(" "), t),
        )

    pos_grams = df.select(
        F.col(id_col).alias("_id"), F.posexplode(grams).alias("_p", "_g")
    )
    hits = pos_grams.join(
        F.broadcast(hot), pos_grams["_g"] == hot["gram"], "left_semi"
    )
    hotp = hits.groupBy("_id").agg(F.collect_set("_p").alias("_hp"))

    out = df.join(hotp, df[id_col] == hotp["_id"], "left").drop("_id")
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("_hp"), F.array().cast("array<int>")),
                lambda p: F.sequence(p, p + F.lit(n - 1)),
            )
        )
    )
    kept = F.filter(toks, lambda t, i: ~F.array_contains(covered, i))
    return out.withColumn(out_col, F.array_join(kept, " ")).drop("_hp")


def ngram_decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_eval,
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at least
    ``min_shared`` distinct word ``n``-grams with any held-out/eval document
    (``is_eval`` is a boolean Column splitting the corpus).

    Returns (id, n_shared_grams) for contaminated TRAIN documents.

    Shape at 100 TB: eval sets are small (benchmarks, not corpora), so the
    distinct eval-gram list is BROADCAST; the train side is one map-side
    shingle explode, a broadcast hash join, and an (id)-keyed partial-agg
    count — no shuffle of document bodies, no all-pairs anything.
    """
    g = df.select(
        F.col(id_col),
        is_eval.alias("_is_eval"),
        F.explode(word_shingles(text_col, n)).alias("gram"),
    )
    eval_grams = g.filter(F.col("_is_eval")).select("gram").distinct()
    return (
        g.filter(~F.col("_is_eval"))
        .join(F.broadcast(eval_grams), "gram")
        # shingles are distinct per document, so COUNT(*) is the number of
        # distinct shared grams
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )


def curate_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.5,
) -> DataFrame:
    """Quality gate + exact dedup; returns surviving (id, quality).

    Quality scoring (tokenize + stopword/punctuation ratios per document)
    is the expensive map stage; widen the input so it runs at cluster
    width (no-op when the scan already splits)."""
    from tulflow_spark.io import widen

    df = widen(df)
    scored = df.select(
        F.col(id_col), F.col(text_col), quality_score(text_col).alias("quality")
    ).filter(F.col("quality") >= min_quality)
    keepers = exact_dedup(scored, id_col, text_col).select(
        F.col("keeper").alias(id_col)
    )
    return keepers.join(scored, id_col).select(id_col, "quality")


def curate_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.4,
    near_dup_threshold: float = 0.8,
    base: DataFrame | None = None,
    **minhash_kwargs,
) -> DataFrame:
    """Full curation: quality gate → exact dedup → near-dup removal.

    Near-dup policy: from every pair with jaccard >= threshold, drop the
    higher id — this keeps every LOCAL minimum (any doc never the larger
    end of a pair), which always includes each component's global minimum
    but may keep additional members of a chain-shaped cluster.  For exact
    one-representative-per-cluster semantics use
    :func:`curate_near_dup_cc` (connected-components resolution).

    ``base``: optional precomputed :func:`curate_exact` result (id, quality).
    The base is consumed twice (survivor join for pair generation, final
    anti-join); a caller doing repeated curation should materialize it and
    pass it in, OWNING the cache lifecycle (``localCheckpoint`` or
    persist+unpersist after the result materializes).  When omitted, the
    base lineage is simply evaluated twice — this function never persists
    on the caller's behalf (an internal persist has no sound unpersist
    point for a lazily-returned frame and leaks cache for the session;
    r3 VERDICT, pinned by the no-cached-rdds test)."""
    if base is None:
        base = curate_exact(df, id_col, text_col, min_quality)
    survivors = df.join(base.select(id_col), id_col)
    pairs = minhash_lsh_pairs(
        survivors, id_col, text_col,
        threshold=near_dup_threshold, **minhash_kwargs,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return base.join(losers, id_col, "left_anti")


def curate_near_dup_cc(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.4,
    near_dup_threshold: float = 0.8,
    base: DataFrame | None = None,
    **minhash_kwargs,
) -> DataFrame:
    """Exact-cluster variant of :func:`curate_near_dup`: resolve the
    candidate-pair graph into connected components and keep exactly ONE
    representative (the minimum id) per near-dup cluster.

    The greedy pairwise rule keeps every *local* minimum — in a component
    {1,3}-{2,3} it keeps both 1 and 2.  This variant keeps only the global
    component minimum, the semantics production dedup pipelines
    (CCNet/RefinedWeb-style) actually want.

    Cost over the greedy variant: the O(log^2 n)-round component
    resolution of :func:`tulflow_spark.ext.components.connected_components`
    over the (small) pair list — document payloads still shuffle zero
    extra times.
    """
    from tulflow_spark.ext.components import connected_components

    if base is None:
        base = curate_exact(df, id_col, text_col, min_quality)
    survivors = df.join(base.select(id_col), id_col)
    pairs = minhash_lsh_pairs(
        survivors, id_col, text_col,
        threshold=near_dup_threshold, **minhash_kwargs,
    )
    comp = connected_components(pairs, "id_a", "id_b")
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return base.join(losers, id_col, "left_anti")


def curate_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_quality: float = 0.5,
    words_per_line: int = 3,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    seq_len: int = 2048,
) -> DataFrame:
    """The full EXACT preprocessing pipeline a pretraining corpus goes
    through, composed end-to-end in one declarative plan:

    1. quality gate (``quality_score >= min_quality``);
    2. exact document dedup (md5 groupBy, min-id keeper);
    3. corpus-wide line-level dedup (first occurrence wins) rewriting
       each survivor's text;
    4. deterministic hash-threshold domain sampling (mixing weights);
    5. greedy sequence packing of the deduped text.

    Every stage is hash-exact (no approximation), so the WHOLE
    composition is oracle-checkable — the approximate variants
    (near-dup, LSH) slot between 2 and 3 via :func:`curate_near_dup_cc`.

    Returns one row per surviving document:
    ``(id, group, quality, n_lines, n_kept, n_tokens, seq_id,
    seq_offset)`` where ``n_tokens`` counts the line-deduped text and
    ``(seq_id, seq_offset)`` locate the document in the packed stream.

    Scale: stages 1-2 are cur1's shape (map + one md5-keyed agg + join);
    stage 3 is dd9's (map-side-combinable keeper agg); stage 4 is a pure
    filter; stage 5 is the bucketed grouped prefix sum.  Nothing
    collects, nothing is quadratic, every join key is either broadcast
    or the data's natural id.

    Two stages are ``localCheckpoint``-materialized because the
    composition fans out from them (Catalyst shares no subtrees across
    self-joins): ``base`` feeds line dedup AND the metadata join, and
    the sampled survivors feed packing AND the final projection —
    un-materialized, the one-DAG plan re-derived the whole gate+dedup
    upstream for every consumer (48 corpus scans in the cur4
    before-plan; 2 after).  At 100 TB these are exactly the two points
    a production pipeline would persist (the curated base and the
    sampled survivors); block hygiene mirrors ext.components — the
    base's blocks are dropped as soon as the survivor stage holding
    every remaining column has materialized.
    """
    from tulflow_spark.ext.linedup import dedup_lines, pseudo_lines
    from tulflow_spark.ext.mixing import hash_sample, pack_sequences
    from tulflow_spark.io import widen

    # quality scoring + line dedup are the expensive map stages; a
    # single-row-group input would otherwise pin them to one core
    # (guide §2.5 input skew) — widen is a no-op when the scan splits.
    df = widen(df)
    scored = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(text_col),
        quality_score(text_col).alias("quality"),
    ).filter(F.col("quality") >= min_quality)
    keepers = exact_dedup(scored, id_col, text_col).select(
        F.col("keeper").alias(id_col)
    )
    sc = df.sparkSession.sparkContext

    def _persistent_ids() -> set:
        return {
            int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        }

    pre_existing = _persistent_ids()
    base = _materialize(keepers.join(scored, id_col))
    base_ids = _persistent_ids() - pre_existing

    lined = dedup_lines(base, id_col, pseudo_lines(text_col, words_per_line))
    cur = base.select(id_col, group_col, "quality").join(lined, id_col)

    sampled = _materialize(
        hash_sample(cur, id_col, group_col, rates or {}, default_rate)
    )
    # the survivor checkpoint holds every column the tail reads; the
    # base's blocks are dead weight from here (components hygiene)
    jmap = sc._jsc.getPersistentRDDs()
    for rid in base_ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)

    packed = pack_sequences(sampled, id_col, "text_dedup", seq_len=seq_len)
    return sampled.select(
        id_col, group_col, "quality", "n_lines", "n_kept"
    ).join(packed, id_col).select(
        id_col,
        group_col,
        "quality",
        "n_lines",
        "n_kept",
        "n_tokens",
        "seq_id",
        "seq_offset",
    )
