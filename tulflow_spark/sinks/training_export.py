"""Training-data export sink: write a corpus as deterministic shards with
a verifiable manifest — the last stage of the pipeline, where a trainer
consumes the data.

Layout: ``{path}/shard=<xx>/*.parquet`` (xx = first two hex chars of
md5(id + ':' + seed) — the SAME keying as the tr1 training shuffle, so
reading shards in name order and rows in shuffle_rank order reproduces the
epoch permutation) plus ``{path}/manifest.json``:

    {"seed": ..., "n_shards": 256, "total_rows": N, "total_tokens": T,
     "shards": {"00": {"rows": n, "tokens": t, "id_checksum": "..."}, ...}}

``id_checksum`` is an order-insensitive aggregate (sum of each id's
60-bit md5 prefix — 15 hex chars — mod 2^63) so a reader can verify shard
completeness without re-listing ids.  All manifest numbers come from ONE
aggregate over the written data (read back, so the manifest describes what
is actually on disk, not what the writer intended).

Scale: the shard column is map-side; the write shuffles once on shard
(256-way); the manifest aggregate is a shard-count-sized result.  Restart
safety: the manifest is written LAST — its presence marks a complete
export (same commit-point doctrine as streaming/manifest_snapshot.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from tulflow_spark.io import read_parquet as _read_parquet
from pyspark.sql import functions as F

from tulflow_spark import fsio

# 2^63 exceeds the Long literal range: carry it as a DECIMAL literal
_MOD = str(1 << 63)


def _shard_col(id_col: str, seed: str):
    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
    )
    return F.substring(key, 1, 2)


def _checksum_col(id_col: str, seed: str):
    """Order-insensitive per-shard id checksum: sum of 60-bit md5 prefixes
    (15 hex chars) mod 2^63 — engine-portable, reader-recomputable."""
    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
    )
    return F.conv(F.substring(key, 1, 15), 16, 10).cast("decimal(30,0)")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    token_count_col: str | None = None,
    seed: str = "epoch-0",
) -> dict:
    """Write the export + manifest; returns the manifest dict."""
    out = df.withColumn("shard", _shard_col(id_col, seed))
    out.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/data"
    )
    spark = df.sparkSession
    written = _read_parquet(spark, f"{path}/data")
    data_dir = "data"
    toks = (
        F.sum(F.col(token_count_col).cast("long"))
        if token_count_col
        else F.lit(None).cast("long")
    )
    per_shard = (
        written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            toks.alias("tokens"),
            (F.sum(_checksum_col(id_col, seed))
             % F.lit(_MOD).cast("decimal(30,0)"))
            .cast("long")
            .alias("id_checksum"),
        )
        .collect()
    )
    manifest = {
        "version": 1,
        "data_dir": data_dir,
        "seed": seed,
        "id_col": id_col,
        "token_count_col": token_count_col,
        "n_shards": len(per_shard),
        "total_rows": int(sum(r["rows"] for r in per_shard)),
        # a shard whose every row has NULL token_count aggregates to a
        # NULL sum: record it as null (verify_training_shards already
        # reads it back that way) instead of crashing on int(None), and
        # keep it out of the total
        "total_tokens": (
            int(sum(r["tokens"] for r in per_shard
                    if r["tokens"] is not None))
            if token_count_col
            else None
        ),
        "shards": {
            r["shard"]: {
                "rows": int(r["rows"]),
                "tokens": (
                    int(r["tokens"])
                    if token_count_col and r["tokens"] is not None
                    else None
                ),
                "id_checksum": str(r["id_checksum"]),
            }
            for r in per_shard
        },
    }
    fs, p = fsio.resolve(f"{path}/manifest.json")
    with fs.open_output_stream(p) as stream:
        stream.write(json.dumps(manifest, sort_keys=True).encode("utf-8"))
    return manifest


def verify_training_shards(spark: SparkSession, path: str) -> dict:
    """Reader-side audit: recompute every manifest figure from the data
    and return {"ok": bool, "mismatches": [...]} — the check a trainer
    runs before an epoch."""
    fs, p = fsio.resolve(f"{path}/manifest.json")
    with fs.open_input_stream(p) as stream:
        manifest = json.loads(stream.read().decode("utf-8"))
    written = _read_parquet(spark, 
        f"{path}/{manifest.get('data_dir', 'data')}"
    )
    id_col = manifest["id_col"]
    tcc = manifest.get("token_count_col")
    toks = (
        F.sum(F.col(tcc).cast("long")) if tcc
        else F.lit(None).cast("long")
    )
    got = {
        r["shard"]: (
            int(r["rows"]),
            (int(r["tokens"]) if r["tokens"] is not None else None)
            if tcc
            else None,
            str(r["chk"]),
        )
        for r in written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            toks.alias("tokens"),
            (F.sum(_checksum_col(id_col, manifest["seed"]))
             % F.lit(_MOD).cast("decimal(30,0)"))
            .cast("long")
            .alias("chk"),
        )
        .collect()
    }
    mismatches = []
    for shard, meta in manifest["shards"].items():
        g = got.get(shard)
        if g is None:
            mismatches.append(f"{shard}: missing on disk")
        elif g != (meta["rows"], meta.get("tokens"), meta["id_checksum"]):
            mismatches.append(
                f"{shard}: manifest "
                f"{meta['rows']}/{meta.get('tokens')}/"
                f"{meta['id_checksum']} != disk {g[0]}/{g[1]}/{g[2]}"
            )
    if tcc and all(g[1] is not None for g in got.values()):
        # a shard with NULL tokens is already flagged per-shard above
        disk_total = sum(g[1] for g in got.values())
        if manifest.get("total_tokens") != disk_total:
            mismatches.append(
                f"total_tokens: manifest {manifest.get('total_tokens')} "
                f"!= disk {disk_total}"
            )
    for shard in set(got) - set(manifest["shards"]):
        mismatches.append(f"{shard}: on disk but not in manifest")
    return {"ok": not mismatches, "mismatches": mismatches}


def append_training_shards(
    spark: SparkSession, path: str, new_df: DataFrame
) -> dict:
    """Incremental export: shard NEW rows with the export's stored seed
    (same permutation keying), append them into the data layout, archive
    the current manifest as ``manifest-v{N}.json``, and write a fresh
    manifest (version N+1) recomputed from the data on disk.  Appended ids
    must be new (the id checksum makes duplicates visible to
    :func:`verify_training_shards` consumers that track deltas, but
    uniqueness is the caller's contract, as in any append-only log)."""
    fs, p = fsio.resolve(f"{path}/manifest.json")
    with fs.open_input_stream(p) as stream:
        old = json.loads(stream.read().decode("utf-8"))
    seed, id_col = old["seed"], old["id_col"]
    token_count_col = old.get("token_count_col")
    data_dir = old.get("data_dir", "data")
    out = new_df.withColumn("shard", _shard_col(id_col, seed))
    out.write.mode("append").partitionBy("shard").parquet(
        f"{path}/{data_dir}"
    )
    # archive the superseded manifest, then recompute over ALL data
    fs2, arch = fsio.resolve(f"{path}/manifest-v{old['version']:05d}.json")
    with fs2.open_output_stream(arch) as stream:
        stream.write(json.dumps(old, sort_keys=True).encode("utf-8"))
    written = _read_parquet(spark, f"{path}/{data_dir}")
    toks = (
        F.sum(F.col(token_count_col).cast("long"))
        if token_count_col
        else F.lit(None).cast("long")
    )
    per_shard = (
        written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            toks.alias("tokens"),
            (F.sum(_checksum_col(id_col, seed))
             % F.lit(_MOD).cast("decimal(30,0)"))
            .cast("long")
            .alias("id_checksum"),
        )
        .collect()
    )
    manifest = {
        "version": old["version"] + 1,
        "data_dir": data_dir,
        "seed": seed,
        "id_col": id_col,
        "token_count_col": token_count_col,
        "n_shards": len(per_shard),
        "total_rows": int(sum(r["rows"] for r in per_shard)),
        # a shard whose every row has NULL token_count aggregates to a
        # NULL sum: record it as null (verify_training_shards already
        # reads it back that way) instead of crashing on int(None), and
        # keep it out of the total
        "total_tokens": (
            int(sum(r["tokens"] for r in per_shard
                    if r["tokens"] is not None))
            if token_count_col
            else None
        ),
        "shards": {
            r["shard"]: {
                "rows": int(r["rows"]),
                "tokens": (
                    int(r["tokens"])
                    if token_count_col and r["tokens"] is not None
                    else None
                ),
                "id_checksum": str(r["id_checksum"]),
            }
            for r in per_shard
        },
    }
    with fs.open_output_stream(p) as stream:
        stream.write(json.dumps(manifest, sort_keys=True).encode("utf-8"))
    return manifest


def compact_training_shards(spark: SparkSession, path: str) -> dict:
    """Compaction: many small appended files per shard → ONE file per
    shard, written to a NEW versioned data directory and committed by the
    manifest swap (readers resolve ``data_dir`` from the manifest, so the
    switch is atomic at the manifest write — the same commit-point
    doctrine as streaming/manifest_snapshot.py; the superseded directory
    stays until :func:`vacuum_training_export`)."""
    fs, p = fsio.resolve(f"{path}/manifest.json")
    with fs.open_input_stream(p) as stream:
        old = json.loads(stream.read().decode("utf-8"))
    src = f"{path}/{old.get('data_dir', 'data')}"
    new_dir = f"data-v{old['version'] + 1:05d}"
    # one task per shard -> one file per shard
    _read_parquet(spark, src).repartition("shard").write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(f"{path}/{new_dir}")
    fs2, arch = fsio.resolve(f"{path}/manifest-v{old['version']:05d}.json")
    with fs2.open_output_stream(arch) as stream:
        stream.write(json.dumps(old, sort_keys=True).encode("utf-8"))
    manifest = dict(old)
    manifest["version"] = old["version"] + 1
    manifest["data_dir"] = new_dir
    manifest["compacted_from"] = old.get("data_dir", "data")
    with fs.open_output_stream(p) as stream:
        stream.write(json.dumps(manifest, sort_keys=True).encode("utf-8"))
    return manifest


def vacuum_training_export(path: str) -> list[str]:
    """Delete data directories no longer referenced by the CURRENT
    manifest (superseded by compaction).  Safe because readers resolve
    ``data_dir`` from the manifest: anything else under ``data*`` is
    unreachable.  Returns the deleted directory names."""
    fs, p = fsio.resolve(f"{path}/manifest.json")
    with fs.open_input_stream(p) as stream:
        live = json.loads(stream.read().decode("utf-8")).get(
            "data_dir", "data"
        )
    import pyarrow.fs as pafs

    fs2, root = fsio.resolve(path)
    deleted = []
    for info in fs2.get_file_info(pafs.FileSelector(root)):
        name = info.path.rsplit("/", 1)[-1]
        if (
            info.type == pafs.FileType.Directory
            and (name == "data" or name.startswith("data-v"))
            and name != live
        ):
            fs2.delete_dir(info.path)
            deleted.append(name)
    return sorted(deleted)


__all__ = [
    "write_training_shards",
    "verify_training_shards",
    "append_training_shards",
    "compact_training_shards",
    "vacuum_training_export",
]
