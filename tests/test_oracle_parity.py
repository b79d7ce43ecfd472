"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local mirror of the driver's CORRECTNESS gate.  Queries
without an oracle get a smoke check (runs, stable schema)."""

from __future__ import annotations

import pytest

from tests.compare import assert_frames_match
from tulflow_spark.plans import ORACLE, QUERIES, load_all

load_all()

WITH_ORACLE = sorted(n for n in QUERIES if n in ORACLE)
ROWS_ONLY = sorted(n for n in QUERIES if n not in ORACLE)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.sql(ORACLE[name]).df()
    assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
