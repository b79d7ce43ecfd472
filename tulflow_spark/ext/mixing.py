"""Training-data mixing: domain-weighted token-budget sampling and
sequence packing, built on a range-bucketed grouped prefix sum.

A training run doesn't take a corpus as-is: it SAMPLES each domain to a
token budget (the data-mixing weights of an LLM pretraining recipe) and
PACKS the survivors into fixed-length sequences.  Both need a running
token total in a deterministic global order — and a naive
``SUM() OVER (PARTITION BY domain ORDER BY k)`` puts an entire domain
into ONE window partition: a 10 TB domain would sort and scan on a
single task.

:func:`grouped_prefix_sum` is the scale-correct primitive both are built
on.  The deterministic order key is ``md5(id)`` (identically computable
by any SQL engine, so results are reproducible across systems); its
leading hex pair splits the key range into 256 ordered buckets, and the
running total becomes:

1. per-(group, bucket) token totals — a map-side-combinable aggregate;
2. a cumulative window over that TINY aggregated frame (256 rows per
   group) to get each bucket's starting offset;
3. a broadcast join of the offsets back, then a per-row cumulative
   window partitioned by (group, bucket) — parallelism is
   ``n_groups x 256`` and each sort is bounded by a bucket, not a domain.

The composed result is bit-identical to the naive global window (bucket
order is a prefix of key order), which is exactly what the DuckDB
oracles for mx1/mx2 compute.

No reference-repo analogue (the reference moves records, it doesn't mix
corpora); this extends the LLM-pipeline surface alongside ext.dedup and
ext.curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tulflow_spark.ext.text import token_count


def order_key(id_col: Column | str) -> Column:
    """Deterministic, engine-portable shuffle key: lowercase hex md5 of the
    id's decimal string.  Any SQL engine reproduces it, so a sample drawn
    here can be re-drawn (or audited) elsewhere byte-for-byte."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(c.cast("string").cast("binary"))


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    tie_col: str,
    value: Column,
    out_col: str = "cum_value",
    key_out: str = "_ok",
) -> DataFrame:
    """Inclusive running total of ``value`` ordered by ``(key, tie_col)``
    within each group, WITHOUT a per-group single-partition window.

    ``key`` must be a lowercase-hex string (see :func:`order_key`); its
    first two characters define 256 range-ordered buckets.  The broadcast
    offsets frame is ``n_groups x 256`` rows — suitable while group
    cardinality is moderate (domains, languages, shards); for millions of
    groups, swap the broadcast for a shuffle join on the same frame.

    The returned frame carries ``key_out`` (the order key) for downstream
    deterministic ordering, plus ``out_col``.
    """
    d = df.withColumn(key_out, key).withColumn(
        "_bkt", F.substring(key_out, 1, 2)
    ).withColumn("_val", value.cast("long"))

    totals = d.groupBy(*group_cols, "_bkt").agg(F.sum("_val").alias("_bt"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *group_cols,
        "_bkt",
        F.coalesce(F.sum("_bt").over(w_off), F.lit(0)).alias("_off"),
    )

    d = d.join(F.broadcast(offsets), [*group_cols, "_bkt"])
    w_row = Window.partitionBy(*group_cols, "_bkt").orderBy(key_out, tie_col)
    return d.withColumn(
        out_col, (F.col("_off") + F.sum("_val").over(w_row)).cast("long")
    ).drop("_bkt", "_off", "_val")


def domain_token_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
    budgets: dict[str, int],
    default_budget: int | None = None,
) -> DataFrame:
    """Deterministic domain-weighted sampling: within each domain, take
    documents in md5-of-id order until the running whitespace-token total
    exceeds the domain's budget (a document is kept iff its INCLUSIVE
    running total fits).  ``default_budget=None`` keeps unbudgeted domains
    whole.

    Output: ``(id, domain, n_tokens, cum_tokens)`` of kept documents.
    Reproducible anywhere: the order key is md5, the budget rule is pure
    arithmetic — re-running the sample on another engine yields the same
    document set.
    """
    d = df.select(
        F.col(id_col),
        F.col(domain_col),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    d = grouped_prefix_sum(
        d,
        [domain_col],
        order_key(id_col),
        id_col,
        F.col("n_tokens"),
        out_col="cum_tokens",
    )
    budget = None
    for dom, b in sorted(budgets.items()):
        clause = F.when(F.col(domain_col) == dom, F.lit(b))
        budget = clause if budget is None else budget.when(
            F.col(domain_col) == dom, F.lit(b)
        )
    fallback = F.lit(
        default_budget if default_budget is not None else (1 << 62)
    )
    budget = fallback if budget is None else budget.otherwise(fallback)
    return d.filter(F.col("cum_tokens") <= budget).select(
        id_col, domain_col, "n_tokens", "cum_tokens"
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 2048,
) -> DataFrame:
    """Greedy sequence packing: lay documents end-to-end in md5-of-id
    order and cut the stream into fixed ``seq_len``-token training
    sequences.  Each document is assigned the sequence its FIRST token
    lands in plus its offset there — the bookkeeping a packed-pretraining
    data loader needs to locate every document.

    Output: ``(id, n_tokens, seq_id, seq_offset)``.

    The global running total uses :func:`grouped_prefix_sum` with no
    groups: 256-way parallel, no single-partition window — the classic
    scale trap of ``ROW_NUMBER() OVER (ORDER BY ...)``-style packing.
    """
    d = df.select(
        F.col(id_col), token_count(text_col).cast("long").alias("n_tokens")
    )
    d = grouped_prefix_sum(
        d, [], order_key(id_col), id_col, F.col("n_tokens"), out_col="_cum"
    )
    start = F.col("_cum") - F.col("n_tokens")
    return d.select(
        F.col(id_col),
        "n_tokens",
        start.cast("long").alias("_start"),
    ).select(
        id_col,
        "n_tokens",
        F.expr(f"_start DIV {int(seq_len)}").alias("seq_id"),
        (F.col("_start") % seq_len).cast("long").alias("seq_offset"),
    )


def hash_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-domain Bernoulli sampling — the importance-
    resampling step that applies mixing weights: keep each row of domain
    ``d`` with probability ``rates[d]`` (``default_rate`` otherwise),
    decided by the row's own id hash, never by an RNG.

    The coin is :func:`order_key`'s md5 hex: a row survives iff its first
    8 hex chars compare below the 8-hex-digit threshold
    ``floor(rate * 16^8)``.  String comparison on fixed-width lowercase
    hex == numeric comparison, and any SQL engine reproduces it — the
    sample is re-drawable and auditable elsewhere byte-for-byte, and
    resampling at a higher rate yields a SUPERSET of a lower-rate sample
    (nested samples, the property reservoir sampling can't give you).

    Map-only: no shuffle, no RNG state, trivially 100 TB-safe.
    """
    for name, r in list(rates.items()) + [("default", default_rate)]:
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {r}")

    def threshold(rate: float) -> str:
        # fixed 8-hex-width so string order == numeric order; rate 1.0 gets
        # a sentinel above every hex digit ('g' > 'f') to keep all rows
        if rate >= 1.0:
            return "g"
        return format(int(rate * 16**8), "08x")

    expr = F.lit(threshold(default_rate))
    for dom, r in sorted(rates.items()):
        expr = F.when(F.col(group_col) == dom, F.lit(threshold(r))).otherwise(expr)
    key8 = F.substring(order_key(id_col), 1, 8)
    return df.where(key8 < expr)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic multi-way split (train/valid/test carving): assign
    each row a split label by where its md5 hex key falls among the
    cumulative weight thresholds — :func:`hash_sample`'s coin generalized
    from keep/drop to n-way assignment.  Weights must sum to 1 (±1e-9).

    Same guarantees as the sampler: no RNG, no shuffle (map-only), any
    engine re-derives the identical assignment, and a row's split never
    changes as OTHER rows come and go (per-row independence — the
    property a ROW_NUMBER-based split lacks).  ``salt`` decorrelates
    independent splits over the same ids.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    key_src = (
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
        if salt
        else F.col(id_col).cast("string")
    )
    key8 = F.substring(F.md5(key_src), 1, 8)
    names = sorted(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        # cum can reach 1.0 early when trailing splits have zero weight;
        # format() would then produce the 9-char '100000000', which BEATS
        # every 8-char key lexicographically in the wrong direction — use
        # hash_sample's 'g' sentinel (> every hex digit) instead
        t = F.lit(
            "g" if cum >= 1.0 else format(int(cum * 16**8), "08x")
        )
        branch = key8 < t
        expr = (
            F.when(branch, F.lit(name))
            if expr is None
            else expr.when(branch, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def stratified_sample(
    df: DataFrame, id_col: str, group_col: str, k: int
) -> DataFrame:
    """Exact-k-per-group deterministic sample: the k rows with the smallest
    md5 order keys in each group — reservoir sampling's output contract
    (uniform exact-k per stratum) without its RNG or sequential state, so
    any engine re-draws the identical sample (test-set carving, per-domain
    eval slices).

    Scale shape: the hash-order window top-k compiles to a PARTIAL
    ``WindowGroupLimit`` below the group exchange (same plan property as
    ``text.rarity_terms``) — each map task forwards at most k rows per
    group, so a 100 TB stratum shuffles ~k×partitions rows, not the
    stratum."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_key(id_col), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_len: int,
    stride: int | None = None,
) -> DataFrame:
    """Sliding-window document chunking — the max-length/stride segmentation
    every pretraining pipeline runs before packing: windows of ``max_len``
    tokens starting every ``stride`` tokens (overlap = max_len - stride),
    the final window truncated.

    Pure column algebra (tokens → `sequence` of window starts → posexplode
    → `slice`): map-only, no shuffle, no Python — a 100 TB corpus chunks at
    scan speed.  Returns (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    from tulflow_spark.ext.text import tokens

    stride = stride or max_len
    if stride < 1 or max_len < 1:
        raise ValueError("max_len and stride must be >= 1")
    t = tokens(text_col)
    return (
        df.select(F.col(id_col), t.alias("_t"))
        # empty/whitespace-only docs emit NO chunks: without this,
        # floor((0-1)/stride) = -1 makes sequence(0,-1) a DESCENDING
        # [0,-1] (two phantom empty chunks; with stride=1 the _i=-1
        # window crashes slice with INVALID_PARAMETER_VALUE.START)
        .where(F.size("_t") > 0)
        .select(
            id_col,
            "_t",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("_t") - 1) / stride).cast("int"),
                )
            ).alias("chunk_id", "_i"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(F.col("_t"), F.col("_i") * stride + 1, max_len).alias("_c"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_c").cast("long").alias("n_chunk_tokens"),
            F.array_join("_c", " ").alias("chunk_text"),
        )
    )


def quality_mix_approx(
    scored: DataFrame,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    n_buckets: int = 4,
    per_bucket: int = 25,
    accuracy: int = 10_000,
    salt: str = ":mix",
) -> DataFrame:
    """The scale path of quality-bucketed mixing (mx6's NTILE is exact but
    globally sorted): bucket thresholds come from ``percentile_approx``
    (mergeable sketches — one map-side-combinable pass), bucketing is then
    a pure map-side comparison against broadcast literals, and the per-
    bucket exact-k pick is the same hash-ordered window.  Bucket sizes are
    approximate near threshold ties (the accuracy knob bounds it); the
    selection within each bucket is exact.

    This is a TWO-pass operator over ``scored`` (threshold sketch, then
    bucket+select).  When scoring is expensive (e.g. the bigram-LM
    pipeline feeding mx7), persist/checkpoint ``scored`` before calling —
    at 100 TB the scored frame is (id, score) rows, cheap to materialize
    next to re-deriving it from document bodies."""
    from pyspark.sql import Window

    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = scored.select(
        F.percentile_approx(quality_col, probs, accuracy).alias("t")
    ).head()
    thresholds = [float(x) for x in row["t"]]
    bucket = F.lit(1)
    for i, t in enumerate(thresholds):
        bucket = F.when(F.col(quality_col) > t, i + 2).otherwise(bucket)
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy("bucket").orderBy(key, F.col(id_col))
    return (
        scored.withColumn("bucket", bucket.cast("int"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_bucket)
        .drop("rk")
    )


def temperature_rates(
    scored: DataFrame,
    group_col: str,
    token_col: str,
    budget_tokens: float,
    temperature: float = 2.0,
) -> dict[str, float]:
    """Temperature-scaled domain sampling rates (the multilingual /
    multi-source mixing recipe: weight_d ∝ p_d^(1/T), concentrating or
    flattening the natural distribution — T=1 keeps it, T→∞ is uniform):

        s_d    = round(n_docs_d ^ (1/T), 9)
        S      = Σ_d decimal(s_d)                (order-insensitive, exact)
        rate_d = min(1, round(((budget · s_d) / S) / tokens_d, 9))

    The arithmetic runs IN SPARK (one job over a #domains-sized frame) so
    every rounding step is the engine ROUND that the DuckDB oracles mirror
    exactly; the returned dict is a model-sized driver value feeding
    :func:`hash_sample`.  The default T=2 makes the power a correctly-
    rounded IEEE sqrt on every engine."""
    st = scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(token_col).cast("long")).alias("_tok"),
    )
    return rates_from_stats(st, group_col, budget_tokens, temperature)


def rates_from_stats(
    stats: DataFrame,
    group_col: str,
    budget_tokens: float,
    temperature: float = 2.0,
) -> dict[str, float]:
    """The rate arithmetic of :func:`temperature_rates` over a
    PRE-AGGREGATED stats frame (group_col, _n, _tok) — shared with the
    streaming face (streaming/temperature.py), whose stateful counters
    produce exactly this shape, so batch and streaming derive
    bit-identical rates from identical counts."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    st = stats
    if temperature == 2.0:  # sqrt is correctly rounded IEEE; pow is not
        s9 = F.round(F.sqrt(F.col("_n").cast("double")), 9)
    else:
        s9 = F.round(
            F.pow(F.col("_n").cast("double"), 1.0 / temperature), 9
        )
    sq = st.withColumn("_s9", s9)
    total = sq.agg(
        F.sum(F.col("_s9").cast("decimal(30,9)")).cast("double").alias("_S")
    )
    rows = (
        sq.crossJoin(F.broadcast(total))
        .withColumn(
            "_rate",
            F.least(
                F.lit(1.0),
                F.round(
                    ((F.lit(float(budget_tokens)) * F.col("_s9"))
                     / F.col("_S"))
                    / F.col("_tok").cast("double"),
                    9,
                ),
            ),
        )
        .select(group_col, "_rate")
        .collect()
    )
    return {r[group_col]: float(r["_rate"]) for r in rows}


def temperature_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    budget_tokens: float,
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-scaled mixing end to end: derive per-domain rates
    (:func:`temperature_rates`) and apply them with the deterministic
    hash-threshold sampler (:func:`hash_sample`) — map-only selection, no
    RNG, engine-reproducible byte-for-byte."""
    rates = temperature_rates(
        df, group_col, token_col, budget_tokens, temperature
    )
    return hash_sample(df, id_col, group_col, rates, default_rate=0.0)
