"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by the registry in
``tulflow_spark.plans`` — every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline extensions) registers a (spark, sf_dir) callable
and, when SQL-expressible, a DuckDB oracle string with identical column
aliases and order-insensitive (decimal-exact) float aggregation.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: region-revenue rollup — the
    full star join with broadcast dimensions (TPC-H Q5 shape)."""
    from tulflow_spark.plans import EXTRA_QUERIES, QUERIES, load_all

    load_all()
    # merged lookup: the flagship must survive gate rotation (q05 may be
    # driver-gated or parity-suite-only in any given round)
    return {**QUERIES, **EXTRA_QUERIES}["q05_region_revenue"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tulflow_spark.plans import load_all, ordered_queries

    load_all()
    # gate order: oracle-paired queries first (50 of them — the driver
    # adjudicates ~50 entries per round), rows-only approximations last
    # (their quality bounds are themselves oracle-gated by vr1_approx_bounds)
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from tulflow_spark.plans import load_all, ORACLE

    load_all()
    return dict(ORACLE)
