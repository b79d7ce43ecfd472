"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB):

- **exact**: one hash-partitioned groupBy on a 128-bit content key — the only
  shuffle moves (key, id) pairs, never document bodies.
- **minhash_lsh**: signatures are computed entirely map-side (array exprs in
  whole-stage codegen, no explode of shingles); only (band_key, id) pairs are
  shuffled, candidate pairs are verified with exact Jaccard on a self-join
  restricted to LSH buckets.  Bucket skew is handled by AQE skew-join and a
  cap on bucket width.
- **simhash**: 64-bit signature map-side; candidate pairs via banding the
  signature into 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ one of 4 chunks
  equal), verified with bit_count(xor).
- **ngram_jaccard**: exact pairwise Jaccard via an inverted-index join on
  shingles — the expensive-but-exact baseline; at scale, run it only on
  minhash candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_key(col: Column | str) -> Column:
    """128-bit exact-dup key (md5 of raw text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id representative per exact content key.

    Returns (keeper id, n_copies, content key).  `min(id)` keeps selection
    deterministic under any partitioning (unlike dropDuplicates, which keeps
    an arbitrary row).  No io.widen here: md5 is cheap relative to an
    exchange and the groupBy redistributes immediately anyway.
    """
    return (
        df.select(F.col(id_col), content_key(text_col).alias("ck"))
        .groupBy("ck")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles, computed map-side with array exprs.

    Built by zipping n shifted views of the token array (O(tokens) work —
    the naive slice-per-position construction is O(tokens²) and measurably
    dominates dedup plans).  zip_with pads the shorter side with NULL and
    concat propagates it, so trailing partial grams drop out in the filter.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    grams = toks
    for i in range(1, n):
        shifted = F.slice(toks, i + 1, F.size(toks))
        grams = F.zip_with(
            grams, shifted, lambda g, t: F.concat(g, F.lit(" "), t)
        )
    return F.array_distinct(F.filter(grams, lambda g: g.isNotNull()))


def minhash_signature(shingles: Column, k: int = 32) -> Column:
    """k-permutation MinHash signature, fully map-side.

    One base hash per shingle (murmur3, JVM-side), then k seeded murmur3
    re-hashes of that LONG — cheap fixed-width hashing instead of k
    string hashes per shingle (the difference between an interpreter-bound
    plan and a cheap one).  Empty shingle sets get NULL signature elements
    (never matching any band)."""
    return minhash_signature_from_hashes(shingle_hashes(shingles), k)


def shingle_hashes(shingles: Column) -> Column:
    """Base 32-bit hash per shingle, widened to non-negative long.
    Materialize this as its own column before building the signature —
    Catalyst does not CSE the subexpression across the k permutations."""
    return F.transform(
        shingles,
        lambda s: F.hash(s).cast("bigint").bitwiseAND(F.lit(0xFFFFFFFF)),
    )


def minhash_signature_from_hashes(hashes: Column, k: int = 32) -> Column:
    """k independent min-hashes via per-permutation murmur3 re-hash of the
    64-bit base hash — long-input hashing, still cheap and JVM-side.

    NOT the affine form ``(a·h+b) mod (2^61−1)`` with a < 2^29: that map
    wraps the modulus at most once over h < 2^32, so each "permutation"
    is merely a rotation cut of the SAME base-hash ordering — the k
    components come out heavily correlated (measured: a 0.91-Jaccard pair
    agreed on 9/32 components) and both the agreement estimator and the
    LSH banding guarantees silently degrade.  Re-hashing with a distinct
    seed per component gives genuinely independent orderings (the same
    0.91 pair agrees on ~29/32)."""

    def _perm(i: int) -> Column:
        return F.array_min(
            F.transform(
                hashes,
                lambda h: F.hash(F.lit(i), h)
                .cast("bigint")
                .bitwiseAND(F.lit(0xFFFFFFFF)),
            )
        )

    return F.array(*[_perm(i) for i in range(k)])


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH band keys: hash of each r-row slice of the signature."""
    return F.array(
        *[
            F.hash(F.lit(b), F.slice(sig, b * rows + 1, rows))
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays — JVM set ops."""
    inter = F.size(F.array_intersect(a, b))
    return F.when(
        F.size(a) + F.size(b) > 0,
        inter / (F.size(a) + F.size(b) - inter),
    ).otherwise(F.lit(0.0))


def shingle_frame(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(_id, _sh) shingle projection — the shared input of the MinHash and
    exact-Jaccard paths.  Persist it and pass it to both via ``shingles=``
    when running them over the same corpus (the verification harness does).

    Shingling (split + n zip_with passes + array_distinct per document) is
    the expensive map stage of every dedup plan, so the input is widened to
    cluster parallelism first — a no-op whenever the scan already splits
    (the 100 TB case), one small raw-row exchange when it does not
    (guide §2.5 input-skew rule: a single-row-group parquet file otherwise
    pins the whole stage to one core)."""
    from tulflow_spark.io import widen

    return widen(df).select(
        F.col(id_col).alias("_id"), word_shingles(text_col, n).alias("_sh")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.3,
    max_bucket: int = 1000,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact Jaccard.

    Output: (id_a, id_b, jaccard_sim) with id_a < id_b, sim >= threshold.
    ``max_bucket`` drops degenerate buckets (e.g. empty docs) that would
    produce quadratic blowup — at 100 TB this cap is essential and the
    dropped buckets are logged as a side observable, not silently eaten.
    ``shingles``: optional precomputed :func:`shingle_frame` (caller owns
    its cache lifecycle).
    """
    rows = k // bands
    base = (
        shingles
        if shingles is not None
        else shingle_frame(df, id_col, text_col, n)
    )
    banded = (
        base.withColumn("_h32", shingle_hashes(F.col("_sh")))
        .withColumn("_sig", minhash_signature_from_hashes(F.col("_h32"), k))
        .select(
            "_id",
            F.posexplode(band_keys(F.col("_sig"), bands, rows)).alias(
                "_band_idx", "_band_key"
            ),
        )
    )

    # bucket → posting list (capped) → in-row pair generation.  Only
    # (band, id) pairs ever shuffle; shingle arrays stay out of the exchange.
    buckets = banded.groupBy("_band_idx", "_band_key").agg(
        F.sort_array(F.collect_list(F.struct(F.col("_id")))).alias("_docs")
    )
    buckets = buckets.filter(
        (F.size("_docs") >= 2) & (F.size("_docs") <= max_bucket)
    )
    candidates = (
        buckets.select(F.explode(_ordered_pairs(F.col("_docs"))).alias("_p"))
        .select(
            F.col("_p.a._id").alias("id_a"), F.col("_p.b._id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    # verify candidates with exact Jaccard.  ONE probe pass over the
    # shingle projection instead of two side-joins: the old
    # ``candidates ⋈ sh_a ⋈ sh_b`` form evaluated the expensive shingle
    # map stage (split + n zip_with + array_distinct over the whole
    # corpus) once per side — measured as two duplicate full-width
    # stages in every LSH plan.  Exploding each pair into its member
    # ids, attaching shingles with a single join, and reassembling by
    # pair key evaluates that stage once; only CANDIDATE docs' shingle
    # arrays shuffle, keyed by pair (pair-list-sized, never corpus-
    # sized).
    sides = candidates.select(
        "id_a",
        "id_b",
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("_id"), F.lit(0).alias("_side")),
                F.struct(F.col("id_b").alias("_id"), F.lit(1).alias("_side")),
            )
        ).alias("_m"),
    ).select(
        "id_a", "id_b", F.col("_m._id").alias("_id"),
        F.col("_m._side").alias("_side"),
    )
    paired = (
        sides.join(base, "_id")
        .groupBy("id_a", "id_b")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_side"), F.col("_sh")))
            ).alias("_ss")
        )
    )
    return (
        paired.withColumn(
            "jaccard_sim",
            jaccard(F.col("_ss")[0]["_sh"], F.col("_ss")[1]["_sh"]),
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def _ordered_pairs(docs: Column) -> Column:
    """All (docs[i], docs[j]) i<j combinations from a sorted struct array —
    pair generation stays inside one row, no self-join."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(docs) - 1),
            lambda i: F.transform(
                F.slice(docs, i + 1, F.size(docs)),
                lambda d: F.struct(
                    F.element_at(docs, i).alias("a"), d.alias("b")
                ),
            ),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.3,
    max_gram_docs: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via an inverted index.

    Output: (id_a, id_b, jaccard_sim), id_a < id_b, sim >= threshold.

    One pass: shingles are computed once, grouped by shingle, and pairs are
    generated inside each posting list (vs. the classic self-join, which
    recomputes the shingle projection for both sides).  ``max_gram_docs``
    skips ultra-common shingles (stopword grams) — at 100 TB this cap is
    mandatory and is the standard prefix-filtering trade-off; leave None for
    exact results on modest corpora.  ``shingles``: optional precomputed
    :func:`shingle_frame` (caller owns its cache lifecycle).
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_frame(df, id_col, text_col, n)
    )
    flat = sh.select("_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_g"))
    postings = flat.groupBy("_g").agg(
        F.sort_array(F.collect_list(F.struct("_id", "_n"))).alias("_docs")
    )
    postings = postings.filter(F.size("_docs") >= 2)
    if max_gram_docs is not None:
        postings = postings.filter(F.size("_docs") <= max_gram_docs)
    pairs = postings.select(
        F.explode(_ordered_pairs(F.col("_docs"))).alias("_p")
    ).select(
        F.col("_p.a._id").alias("id_a"),
        F.col("_p.b._id").alias("id_b"),
        F.col("_p.a._n").alias("_na"),
        F.col("_p.b._n").alias("_nb"),
    )
    inter = pairs.groupBy("id_a", "id_b", "_na", "_nb").agg(
        F.count(F.lit(1)).alias("_i")
    )
    return (
        inter.withColumn(
            "jaccard_sim",
            F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")),
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def simhash64(col: str) -> Column:
    """64-bit SimHash of whitespace tokens, fully map-side.

    Per token: xxhash64; per bit: +1/-1 vote; signature bit = sign of vote
    sum.  Expressed as SQL higher-order functions (the Python ``shiftright``
    wrapper only takes literal shift amounts) so whole-stage codegen keeps
    the whole thing JVM-side.  ``col`` is a column *name* (or SQL expr).
    """
    votes = f"""
      aggregate(
        split(trim({col}), '\\\\s+'),
        array_repeat(0, 64),
        (acc, t) -> zip_with(
          acc,
          transform(sequence(0, 63),
                    i -> if((shiftright(xxhash64(t), i) & 1) = 1, 1, -1)),
          (a, v) -> a + v))
    """
    return F.expr(
        f"""
      aggregate(
        zip_with({votes}, sequence(0, 63), (v, i) -> struct(v, i)),
        cast(0 as bigint),
        (acc, s) -> acc + if(s.v > 0, shiftleft(cast(1 as bigint), s.i),
                             cast(0 as bigint)))
    """
    )


def with_simhash(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "_sig"
) -> DataFrame:
    """SimHash via explode + 64 codegen'd aggregates — same signature as
    :func:`simhash64` but an order of magnitude cheaper: the per-bit votes
    become vectorized SUM(CASE…) expressions in a hash aggregate instead of
    nested interpreted array folds.  The tokenize+explode+partial-agg map
    stage is the expensive part, so the input is widened first (no-op when
    the scan already splits)."""
    from tulflow_spark.io import widen

    df = widen(df)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_t"),
    ).select("_id", F.xxhash64("_t").alias("_h"))
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"_v{i}")
        for i in range(64)
    ]
    voted = toks.groupBy("_id").agg(*votes)
    sig = None
    for i in range(64):
        bit = F.when(
            F.col(f"_v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return voted.select("_id", sig.alias(out_col))


def _simhash_chunks(sig: DataFrame) -> DataFrame:
    """Explode a (_id, _sig) frame into (_id, _sig, _chunk_idx, _chunk):
    4 × 16-bit bands of the 64-bit signature (pigeonhole: hamming ≤ 3 ⇒ at
    least one chunk equal)."""
    return sig.select(
        "_id",
        "_sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_sig"), 16 * j).bitwiseAND(F.lit(0xFFFF))
                    for j in range(4)
                ]
            )
        ).alias("_chunk_idx", "_chunk"),
    )


def simhash_overcap_count(sig: DataFrame, max_bucket: int = 1000) -> DataFrame:
    """One-row (n_capped BIGINT): how many (chunk_idx, chunk) buckets exceed
    ``max_bucket`` and are therefore DROPPED by :func:`simhash_pairs`.  The
    cap's recall loss made observable — the verification gate downgrades its
    equality claim to a no-false-pairs claim exactly when this is nonzero."""
    widths = _simhash_chunks(sig).groupBy("_chunk_idx", "_chunk").agg(
        F.count(F.lit(1)).alias("_w")
    )
    return widths.filter(F.col("_w") > max_bucket).agg(
        F.count(F.lit(1)).alias("n_capped")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4 16-bit
    chunks (pigeonhole guarantees recall for hamming <= 3), verify with
    bit_count(a XOR b).

    Candidate generation is the same posting-list shape as
    :func:`minhash_lsh_pairs` — collect (id, sig) per (chunk_idx, chunk
    value), cap the bucket width, generate pairs inside the row.  A raw
    self-join on the chunk value is quadratic on hot chunks (near-empty /
    short documents collapse onto few signatures), which is exactly the skew
    failure ``max_bucket`` exists to bound; buckets wider than the cap are
    dropped, trading recall on degenerate content for a bounded plan (the
    dropped-bucket count is observable via :func:`simhash_overcap_count`).
    ``sig``: optional precomputed :func:`with_simhash` frame (caller owns
    its cache lifecycle).
    """
    if sig is None:
        sig = with_simhash(df, id_col, text_col)
    chunks = _simhash_chunks(sig)
    buckets = chunks.groupBy("_chunk_idx", "_chunk").agg(
        F.sort_array(F.collect_list(F.struct("_id", "_sig"))).alias("_docs")
    )
    buckets = buckets.filter(
        (F.size("_docs") >= 2) & (F.size("_docs") <= max_bucket)
    )
    # sorted posting list ⇒ pairs come out with id_a < id_b already; the
    # signature rides along so no verify-side rejoin is needed
    pairs = (
        buckets.select(F.explode(_ordered_pairs(F.col("_docs"))).alias("_p"))
        .select(
            F.col("_p.a._id").alias("id_a"),
            F.col("_p.b._id").alias("id_b"),
            F.col("_p.a._sig").alias("_sa"),
            F.col("_p.b._sig").alias("_sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
