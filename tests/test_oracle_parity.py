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


# Per-query output contracts for the rows-only registry entries
# (VERDICT r9 #7: `count() >= 0` can never fail).  Structural counts
# (top-k size, one row per vector) pin exactly; probabilistic ones
# (LSH/SimHash pair recall at fixed seeds) get floors well below the
# observed sf0.001 value so only a silently-empty or collapsed result
# fails, not seed-level jitter.
ROWS_ONLY_MIN = {
    "cur2_curate_near_dup": 300,     # observed 463 survivors
    "dd2_minhash_lsh": 10,           # observed 28 candidate pairs
    "dd4_simhash": 10,               # observed 27 near-dup pairs
    "dd5_lsh_blocked_neardup": 200,  # observed 513 blocked pairs
    "ss3_lsh_topk": 10,              # top-k: structurally exact
    "ss4_ivf_topk": 10,              # top-k: structurally exact
    "ss7_kmeans_fit": 500,           # one row per input vector: exact
    "tx11_compression_ratio": 15,    # observed 20 source groups
    "tx12_bpe_merges": 10,           # observed 16 learned merges
}
ROWS_ONLY_EXACT = {"ss3_lsh_topk", "ss4_ivf_topk", "ss7_kmeans_fit"}


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    floor = ROWS_ONLY_MIN.get(name)
    assert floor is not None, (
        f"{name}: rows-only query with no output contract — add an "
        "entry to ROWS_ONLY_MIN (or better, an oracle)"
    )
    n = df.count()
    if name in ROWS_ONLY_EXACT:
        assert n == floor, f"{name}: expected exactly {floor} rows, got {n}"
    else:
        assert n >= floor, f"{name}: expected >= {floor} rows, got {n}"


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
