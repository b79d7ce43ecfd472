"""Persisted MinHash index for incremental corpus dedup: dedup a NEW
batch against an EXISTING corpus without re-shingling the corpus — the
batch face of the daily-ingest mode (streaming/neardup.py is the
per-micro-batch face; this is the bulk one: "yesterday's 100 TB corpus is
indexed, today's crawl arrives").

Layout on disk (any pyarrow-reachable filesystem):

- ``{path}/bands/*.parquet``  (band_idx, band_key, id) — the LSH posting
  lists the candidate join probes.
- ``{path}/sigs/*.parquet``   (id, sig array<bigint>) — k 64-bit minhash
  components per document (k longs, NOT the shingle sets: signatures are
  the compact sketch the corpus side keeps; similarity of a candidate
  pair is the signature-agreement fraction, the unbiased Jaccard
  estimator also used by streaming/neardup.py).
- ``{path}/meta.json``        (n, k, bands) — new batches MUST shingle
  and hash identically or band keys are meaningless; match/append read
  these instead of trusting caller arguments.

Scale shape: the new batch computes signatures map-side (same zip_with
shingles as ext.dedup); the candidate join is an equi-join on
(band_idx, band_key) — shuffle sized by posting lists, never by corpus
text; verification joins k-long signature arrays by id. Appending is an
append-only write of the new rows; no stored data is rewritten.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from tulflow_spark.io import read_parquet as _read_parquet
from pyspark.sql import functions as F

from tulflow_spark import fsio
from tulflow_spark.ext.dedup import (
    band_keys,
    minhash_signature_from_hashes,
    shingle_frame,
    shingle_hashes,
)

# Bump when the signature hash family changes (scheme 2 = per-component
# seeded murmur3 re-hash; scheme 1 was the degenerate affine form).  An
# index written under another scheme must be rebuilt — its signatures
# never agree with freshly computed ones, which would silently re-admit
# every stored near-duplicate.
SIG_SCHEME = 2


def _sig_frame(
    df: DataFrame, id_col: str, text_col: str, n: int, k: int
) -> DataFrame:
    return shingle_frame(df, id_col, text_col, n).select(
        "_id",
        minhash_signature_from_hashes(
            shingle_hashes(F.col("_sh")), k
        ).alias("sig"),
    )


def _band_frame(sigs: DataFrame, k: int, bands: int) -> DataFrame:
    return sigs.select(
        F.col("_id"),
        F.posexplode(band_keys(F.col("sig"), bands, k // bands)).alias(
            "band_idx", "band_key"
        ),
    )


def save_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> int:
    """Index a corpus: signatures + banded posting lists + params.
    Returns the number of indexed documents."""
    sigs = _sig_frame(df, id_col, text_col, n, k)
    sigs.select(F.col("_id").alias("id"), "sig").write.mode(
        "overwrite"
    ).parquet(f"{path}/sigs")
    stored_sigs = _read_parquet(df.sparkSession, f"{path}/sigs").select(
        F.col("id").alias("_id"), "sig"
    )
    _band_frame(stored_sigs, k, bands).select(
        "band_idx", "band_key", F.col("_id").alias("id")
    ).write.mode("overwrite").parquet(f"{path}/bands")
    fs, p = fsio.resolve(f"{path}/meta.json")
    with fs.open_output_stream(p) as stream:
        stream.write(
            json.dumps(
                {"n": n, "k": k, "bands": bands, "sig_scheme": SIG_SCHEME}
            ).encode("utf-8")
        )
    return stored_sigs.count()


def _load_meta(path: str) -> dict:
    fs, p = fsio.resolve(f"{path}/meta.json")
    with fs.open_input_stream(p) as stream:
        meta = json.loads(stream.read().decode("utf-8"))
    if meta.get("sig_scheme") != SIG_SCHEME:
        raise ValueError(
            f"index at {path} uses signature scheme "
            f"{meta.get('sig_scheme')}, this build is scheme {SIG_SCHEME}"
            " — rebuild the index (cross-scheme signatures never agree,"
            " so matching would silently find nothing)"
        )
    return meta


def match_against_index(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate matches of a new batch against the stored corpus:
    (new_id, match_id, est_jaccard) with est >= threshold.  ``est`` is
    the signature-agreement fraction.  Posting lists wider than
    ``max_bucket`` on the stored side are skipped (degenerate buckets,
    same cap policy as ext.dedup.minhash_lsh_pairs)."""
    meta = _load_meta(path)
    n, k, bands = meta["n"], meta["k"], meta["bands"]
    new_sigs = _sig_frame(new_df, id_col, text_col, n, k)
    new_bands = _band_frame(new_sigs, k, bands).select(
        F.col("_id").alias("new_id"), "band_idx", "band_key"
    )
    stored_bands = _read_parquet(spark, f"{path}/bands")
    bucket_sizes = stored_bands.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    stored_ok = stored_bands.join(
        bucket_sizes.filter(F.col("_bn") <= max_bucket),
        ["band_idx", "band_key"],
    ).select("band_idx", "band_key", F.col("id").alias("match_id"))
    cands = (
        new_bands.join(stored_ok, ["band_idx", "band_key"])
        .select("new_id", "match_id")
        .dropDuplicates(["new_id", "match_id"])
    )
    stored_sigs = _read_parquet(spark, f"{path}/sigs").select(
        F.col("id").alias("match_id"), F.col("sig").alias("_sig_s")
    )
    est = (
        cands.join(
            new_sigs.select(
                F.col("_id").alias("new_id"), F.col("sig").alias("_sig_n")
            ),
            "new_id",
        )
        .join(stored_sigs, "match_id")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with(
                        F.col("_sig_n"),
                        F.col("_sig_s"),
                        lambda a, b: a == b,
                    ),
                    lambda x: x,
                )
            ).cast("double")
            / F.lit(float(k)),
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold).select(
        "new_id", "match_id", "est_jaccard"
    )


def dedup_against_index(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    max_bucket: int = 1000,
) -> DataFrame:
    """New-batch survivors: documents with NO stored near-duplicate at
    ``threshold`` — an anti-join of the match report against the batch.
    Original columns preserved."""
    matches = match_against_index(
        spark, path, new_df, id_col, text_col, threshold, max_bucket
    )
    return new_df.join(
        matches.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )


def append_to_minhash_index(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
) -> int:
    """Add a batch to the index (typically the survivors of
    :func:`dedup_against_index`): append-only writes of signatures and
    posting rows, no stored data rewritten.  Returns rows appended."""
    meta = _load_meta(path)
    n, k, bands = meta["n"], meta["k"], meta["bands"]
    sigs = _sig_frame(new_df, id_col, text_col, n, k)
    out = sigs.select(F.col("_id").alias("id"), "sig")
    cnt = out.count()
    out.write.mode("append").parquet(f"{path}/sigs")
    _band_frame(sigs, k, bands).select(
        "band_idx", "band_key", F.col("_id").alias("id")
    ).write.mode("append").parquet(f"{path}/bands")
    return cnt


__all__ = [
    "append_to_minhash_index",
    "dedup_against_index",
    "match_against_index",
    "save_minhash_index",
]
