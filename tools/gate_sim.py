#!/usr/bin/env python
"""Simulate the driver's correctness gate locally: run every GATED query at
a chosen SF (default sf0.01, the driver's gate scale) against its DuckDB
oracle with the same strict comparison as tests/compare.py.

Usage: python tools/gate_sim.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tests.compare import normalize  # noqa: E402
from tulflow_spark.plans import (  # noqa: E402
    EXTRA_ORACLE,
    EXTRA_QUERIES,
    ORACLE,
    QUERIES,
    load_all,
)
from tulflow_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("GATE_SIM_VANILLA"):
        # the driver builds its own untuned session (default 200 shuffle
        # partitions, none of session.py's confs) — the strictest mirror
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark(app_name="gate-sim")
    spark.sparkContext.setLogLevel("ERROR")
    load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    # gated queries by default; explicit names may come from EXTRA too;
    # "--all" runs the ENTIRE registry (gated + local-parity pairs)
    pool = dict(QUERIES)
    oracles = dict(ORACLE)
    if only == {"--all"}:
        only = set()
        pool.update(EXTRA_QUERIES)
        oracles.update(EXTRA_ORACLE)
    elif only:
        pool.update({n: EXTRA_QUERIES[n] for n in only if n in EXTRA_QUERIES})
        oracles.update(
            {n: EXTRA_ORACLE[n] for n in only if n in EXTRA_ORACLE}
        )
        # a misspelled name silently matching nothing would print ALL
        # GREEN — report it as a failure instead
        for n in sorted(set(only) - set(pool)):
            print(f"UNKNOWN query name: {n}")
            bad.append(n)
    for name, fn in pool.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error {exc}")
            bad.append(name)
            continue
        if name not in oracles:
            print(f"rows {name}: {len(sdf)} rows "
                  f"({time.perf_counter() - t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle error {exc}")
            bad.append(name)
            continue
        s, o = normalize(sdf), normalize(odf)
        status = "ok" if s == o else "MISMATCH"
        if s != o:
            bad.append(name)
            diff = [
                (a, b) for a, b in zip(s, o) if a != b
            ][:3] if len(s) == len(o) else []
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}; first diffs "
                  f"{diff}")
        else:
            print(f"{status} {name}: {len(s)} rows "
                  f"({time.perf_counter() - t0:.1f}s)")
    print(f"\n{'ALL GREEN' if not bad else 'FAILURES: ' + ', '.join(bad)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
