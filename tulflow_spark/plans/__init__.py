"""Query-plan registry.

Every implemented operator from SURVEY.md §2 (and the training-data-pipeline
extensions) registers a named query here: a ``(spark, sf_dir) -> DataFrame``
callable plus (when SQL-expressible) a DuckDB oracle string.  The driver's
correctness gate runs both and hash-compares values, so every pair aliases
columns identically and uses order-insensitive (decimal-exact) float
aggregation on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so registration side effects run."""
    from tulflow_spark.plans import (  # noqa: F401
        ext_queries,
        olap_queries,
        star_queries,
        xml_queries,
    )
