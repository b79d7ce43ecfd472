#!/usr/bin/env python
"""Above-sf0.1 scale probe (r4 VERDICT #6): run the queries whose 100 TB
story depends on bucket caps and skew behavior — dd2 (MinHash-LSH), dd5
(banded cosine LSH), dd8 (connected components), ss6 (SemDeDup), mx1
(domain mixing) — at sf0.1 and at the tiled sf1 probe corpus, and report
per-query wall time plus the scaling ratio.

Prints one JSON line: {"metric": "scale_probe", "sf0.1": {...},
"sf1": {...}, "ratio": {...}, "rows": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tulflow_spark.plans import EXTRA_QUERIES, QUERIES, load_all  # noqa: E402
from tulflow_spark.session import get_spark  # noqa: E402

PROBE = ["dd2_minhash_lsh", "dd5_lsh_blocked_neardup", "dd8_components",
         "ss6_semantic_dedup", "mx1_domain_mix"]


def _ss6_autok(spark, sf_dir):
    """SemDeDup with the scale path: k = auto_k(n) holds the mean cluster
    size at 256, vs the gated query's pinned k=8 (pinned is a measured
    scale bug: 71x wall for 10x rows — see SCALE.md)."""
    from tulflow_spark.ext.kmeans import semantic_dedup
    from tulflow_spark.io import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_dedup(emb, k=None, max_iter=5)


def main() -> None:
    base = "/root/testdata/sf0.1"
    big = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    load_all()
    allq = {**QUERIES, **EXTRA_QUERIES, "ss6_autok": _ss6_autok}
    # an explicit name list probes exactly those queries (any registry
    # entry), not just the default bucket-cap five
    probe = sorted(only & set(allq)) if only else [*PROBE, "ss6_autok"]

    # r15 (r14 VERDICT wrong #3): the first measured tier used to carry
    # the fresh-session first-touch penalty (codegen, worker-pool spawn,
    # first lake-fixture write paths), which made the sf0.1 column read
    # 0.18x-0.65x of sf1 — an ordering artifact, not a scale signal.
    # One untimed warm pass over the probe list at the base tier pays
    # those fixed costs before any clock starts; disable with
    # SPARK_GRAFT_PROBE_WARM=0 for a quick smoke.
    if os.environ.get("SPARK_GRAFT_PROBE_WARM", "1") != "0":
        for name in probe:
            allq[name](spark, base).write.mode("overwrite") \
                .format("noop").save()
            print(f"# warm {name}", file=sys.stderr)

    out: dict[str, dict] = {"metric": "scale_probe"}
    rows: dict[str, dict] = {}
    for sf_name, sf_dir in (("sf0.1", base), ("sf1", big)):
        t_sf: dict[str, float] = {}
        r_sf: dict[str, int] = {}
        for name in probe:
            # time from plan construction: iterative operators (dd8's
            # star rounds, the k-means fit) run driver-coordinated jobs
            # BEFORE the final write, and they are part of the cost
            t0 = time.perf_counter()
            df = allq[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            t_sf[name] = round(time.perf_counter() - t0, 2)
            r_sf[name] = df.count()
            print(f"# {sf_name} {name}: {t_sf[name]}s", file=sys.stderr)
        out[sf_name] = t_sf
        rows[sf_name] = r_sf
    out["ratio"] = {
        n: round(out["sf1"][n] / max(out["sf0.1"][n], 1e-9), 2) for n in probe
    }
    out["rows"] = rows
    print(json.dumps(out))


if __name__ == "__main__":
    main()
