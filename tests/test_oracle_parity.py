"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local mirror of the driver's CORRECTNESS gate.  Queries
without an oracle get a smoke check (runs, stable schema)."""

from __future__ import annotations

import pytest

from tests.compare import assert_frames_match
from tulflow_spark.plans import (
    EXTRA_ORACLE,
    EXTRA_QUERIES,
    ORACLE,
    QUERIES,
    load_all,
)

load_all()

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
ALL_ORACLE = {**ORACLE, **EXTRA_ORACLE}
WITH_ORACLE = sorted(n for n in ALL_QUERIES if n in ALL_ORACLE)
ROWS_ONLY = sorted(n for n in ALL_QUERIES if n not in ALL_ORACLE)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, sf_dir, name):
    sdf = ALL_QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.sql(ALL_ORACLE[name]).df()
    assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0


def test_profile_table_hll_variant_close(spark, sf_dir):
    """The scale path (approx_count_distinct) must agree with exact
    within HLL tolerance on every profiled column."""
    from tulflow_spark.io import table
    from tulflow_spark.operators.profile import profile_table

    li = table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_returnflag"]
    exact = {r.column: r.n_distinct
             for r in profile_table(li, cols).collect()}
    approx = {r.column: r.n_distinct
              for r in profile_table(li, cols, exact_distinct=False).collect()}
    for c in cols:
        assert abs(approx[c] - exact[c]) <= max(2, 0.1 * exact[c])
