#!/usr/bin/env python
"""Median re-measurement for queries flagged perf-weak by the r4 verdict
(q17/q19: 2-2.3x vs r1 with unchanged code, suspected co-tenant noise).

Runs each query N times after warmup and prints one JSON line with
per-query medians: on a quiet machine these should sit within 1.3x of the
r1 values (q17 0.79s, q19 0.59s at sf0.1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tulflow_spark.io import DEFAULT_SF_DIR, load_tables  # noqa: E402
from tulflow_spark.plans import EXTRA_QUERIES, QUERIES, load_all  # noqa: E402
from tulflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["q17_small_quantity", "q19_disjunctive_predicates"]
    n_runs = int(os.environ.get("N_RUNS", "7"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR).rstrip("/")
    spark = get_spark(app_name="remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    load_all()
    allq = {**QUERIES, **EXTRA_QUERIES}
    for df in load_tables(spark, sf_dir).values():
        df.count()
    out = {}
    for name in names:
        times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            allq[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "median": round(statistics.median(times), 3),
            "min": min(times),
            "runs": times,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
