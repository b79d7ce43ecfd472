#!/usr/bin/env python
"""Streaming-side scale probe (r5 VERDICT #5): drive the stateful streaming
operators through >= 10 micro-batches at sf0.1-equivalent per-batch rate and
measure (a) per-batch wall and (b) state rows — both must stay FLAT: a
growing per-batch wall or unbounded state is the streaming analog of a
quadratic batch operator.

Method: split an sf0.1 table into N parquet files, feed them through a file
source with maxFilesPerTrigger=1, and after each file drop run
processAllAvailable(), recording wall + the state-operator metrics from
lastProgress.  Writes a markdown table to stdout for SCALE.md.

Usage: python tools/stream_probe.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tulflow_spark.session import get_spark  # noqa: E402


def run_probe(spark, src_df, schema_ddl, n_batches, build_query, out_name,
              output_mode):
    work = tempfile.mkdtemp(prefix=f"streamprobe_{out_name}_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    # pre-materialize the batch files (not timed)
    rows = src_df.collect()
    per = (len(rows) + n_batches - 1) // n_batches
    files = []
    for i in range(n_batches):
        chunk = rows[i * per : (i + 1) * per]
        pdf_path = os.path.join(work, f"chunk{i:03d}.parquet")
        spark.createDataFrame(chunk, src_df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(pdf_path)
        part = [f for f in os.listdir(pdf_path) if f.endswith(".parquet")][0]
        files.append(os.path.join(pdf_path, part))

    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        build_query(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .start()
    )
    out = []
    try:
        for i, f in enumerate(files):
            shutil.copy(f, os.path.join(in_dir, f"b{i:03d}.parquet"))
            t0 = time.perf_counter()
            q.processAllAvailable()
            wall = time.perf_counter() - t0
            prog = q.lastProgress or {}
            ops = prog.get("stateOperators") or [{}]
            out.append(
                {
                    "batch": i,
                    "wall_s": round(wall, 2),
                    "input_rows": per,
                    "state_rows": ops[0].get("numRowsTotal"),
                    "state_mb": round(
                        (ops[0].get("memoryUsedBytes") or 0) / 1e6, 1
                    ),
                }
            )
    finally:
        q.stop()
        shutil.rmtree(work, ignore_errors=True)
    return out


def run_decontam_probe(spark, sf_dir: str, n_batches: int = 6) -> list:
    """r6 VERDICT #5: measure the STREAMING decontamination per-batch wall
    at growing benchmark sizes, for both the new binary-search probe
    (production) and the former array_intersect array-probe (rebuilt
    inline here as the baseline — O(rows x bench) per batch).  The
    production path must stay near-flat as the benchmark grows; the
    baseline's wall grows with it."""
    from pyspark.sql import functions as F

    from tulflow_spark.ext.decontam import (
        _gram_hashes,
        benchmark_gram_set,
        decontaminate,
    )
    from tulflow_spark.io import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = []
    for tiles in (1, 4, 16):
        run_baseline = tiles == 1  # the O(rows x bench) path is measured
        # only at the smallest benchmark (already minutes per batch at
        # ~0.5M grams; larger sizes only multiply the same linearity)
        # benchmark = documents text tiled `tiles`x with a salt, so the
        # distinct-gram count scales ~linearly with `tiles`
        bench = (
            docs.crossJoin(spark.range(tiles).select(F.col("id").alias("_t")))
            .select(
                F.concat_ws(
                    " ", F.col("text"), F.concat(F.lit("salt"), F.col("_t"))
                ).alias("text")
            )
        )
        n_grams = (
            bench.select(F.explode(_gram_hashes("text", 13)).alias("g"))
            .agg(F.countDistinct("g"))
            .head()[0]
        )

        def _old_array_probe(s, bench=bench):
            b = benchmark_gram_set(bench, "text", 13)
            dg = _gram_hashes("text", 13)
            return s.crossJoin(F.broadcast(b)).filter(
                F.size(F.array_intersect(dg, F.col("_bench"))) <= 0
            ).drop("_bench")

        paths = [("searchsorted", lambda s, bench=bench: decontaminate(
            s, bench, "doc_id", "text", n=13))]
        if run_baseline:
            paths.append(("array_probe", _old_array_probe))
        for label, build in paths:
            rows = run_probe(
                spark, docs, "doc_id bigint, text string", n_batches,
                build, f"decontam_{label}_{tiles}", "append",
            )
            # drop the warmup batch when there are follow-ups to measure
            walls = [r["wall_s"] for r in rows[1:]] or \
                [rows[0]["wall_s"]]
            out.append({
                "path": label,
                "bench_grams": int(n_grams),
                "batches": n_batches,
                "rows_per_batch": rows[0]["input_rows"],
                "wall_min_s": min(walls),
                "wall_max_s": max(walls),
            })
            print(f"decontam {label} bench={n_grams}: "
                  f"{[r['wall_s'] for r in rows]}", flush=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark(app_name="stream-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from tulflow_spark.io import table
    from tulflow_spark.streaming.frequent import streaming_frequent_items
    from tulflow_spark.streaming.neardup import stream_minhash_neardup

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    nd = run_probe(
        spark,
        docs,
        "doc_id bigint, text string",
        n_batches,
        lambda s: stream_minhash_neardup(s, max_bucket=1000),
        "neardup",
        "append",
    )
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    fq = run_probe(
        spark,
        ev.selectExpr(
            "concat(event_type, ':', cast(user_id % 997 as string)) AS item"
        ),
        "item string",
        n_batches,
        lambda s: streaming_frequent_items(s, "item", buckets=16, width=64),
        "frequent",
        "update",
    )
    for name, rows in (("stream_minhash_neardup", nd),
                       ("streaming_frequent_items", fq)):
        print(f"\n### {name}")
        print("| batch | input rows | wall (s) | state rows | state MB |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['batch']} | {r['input_rows']} | {r['wall_s']} "
                f"| {r['state_rows']} | {r['state_mb']} |"
            )
    print()
    print(json.dumps({"neardup": nd, "frequent": fq}))


if __name__ == "__main__":
    main()
