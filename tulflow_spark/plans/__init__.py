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

# Oracle pairs held OUT of the driver gate (slot budget, see ordered_queries):
# still first-class — the local parity suite runs them against DuckDB at
# sf0.001 exactly like gated pairs.
EXTRA_QUERIES: dict[str, QueryFn] = {}
EXTRA_ORACLE: dict[str, str] = {}

# The driver adjudicates exactly ~50 queries() entries per round, so gate
# membership is a budget decision, centralized here (r4 VERDICT #1: rotate
# the gate each round so every oracle pair eventually gets a hard driver
# CORRECTNESS row, not just local-parity evidence).
#
# Round-5 rotation: the 37 pairs added in r3/r4 that the driver's
# independent oracle has never adjudicated are promoted; 37 multi-round
# veterans (green in CORRECTNESS_r01..r04) move to the local parity suite.
# The 13 veterans kept gated are the ones whose implementation changes this
# round (XPath/XSLT engine: x1/x3/x4/x2b; skew: sk1; curation: cur1/cur3;
# approx-quality bounds: vr1) or that the r4 verdict flagged for
# re-measurement (q17/q19), plus the flagship star/dedup anchors (q01,
# dd1, aj1).
GATED: frozenset[str] = frozenset(
    {
        # kept veterans (13)
        "vr1_approx_bounds",
        "x1_xpath_extract",
        "x2b_marc_native",
        "x3_validation_rules",
        "x4_transform_rules",
        "q01_pricing_summary",
        "q17_small_quantity",
        "q19_disjunctive_predicates",
        "sk1_salted_sum",
        "aj1_asof_join",
        "cur1_curate_exact",
        "cur3_strip_boilerplate",
        "dd1_exact_dedup",
        # promoted oracle pairs, never driver-adjudicated before r5 (28)
        "a8_heavy_hitters",
        "a9_approx_quantiles",
        "a10_cube",
        "a11_pivot",
        "cur4_full_pipeline",
        "dd8_components",
        "dd9_line_dedup",
        "ev4_funnel",
        "j3_semi_join",
        "mx1_domain_mix",
        "mx2_pack_sequences",
        "mx3_hash_sample",
        "mx4_stratified_sample",
        "mx5_chunk_docs",
        "q04_order_priority",
        "q06_forecast_revenue",
        "q10_returned_revenue",
        "q12_priority_by_status",
        "q16_supplier_cardinality",
        "set1_nation_intersect",
        "sk2_salted_join",
        "ss5_kmeans_assign",
        "ss6_semantic_dedup",
        "tx8_bigram_lm_score",
        "tx9_rarity_terms",
        "tx10_nb_langid",
        "w4_rank",
        "x5_byte_serialize",
        # rows-only approximations, promoted for weak driver rows (9) —
        # their quality bounds are oracle-gated inside vr1_approx_bounds
        "dd2_minhash_lsh",
        "dd4_simhash",
        "dd5_lsh_blocked_neardup",
        "ss3_lsh_topk",
        "ss4_ivf_topk",
        "cur2_curate_near_dup",
        "ss7_kmeans_fit",
        "ss8_pq_topk",
        "tx11_compression_ratio",
    }
)


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry.

    Gate membership comes from the central ``GATED`` set above; everything
    else lands in EXTRA_* and is adjudicated by the local pytest parity
    suite (tests/test_oracle_parity.py) instead of the driver gate.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in GATED:
            QUERIES[name] = fn
            if oracle is not None:
                ORACLE[name] = oracle
        else:
            EXTRA_QUERIES[name] = fn
            if oracle is not None:
                EXTRA_ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so registration side effects run."""
    from tulflow_spark.plans import (  # noqa: F401
        ext_queries,
        olap_queries,
        star_queries,
        tpch_extras,
        web_queries,
        xml_queries,
    )


# The driver's correctness gate adjudicates only the first ~50 entries of
# queries() (round 1: exactly the first 50 of 56 got CORRECTNESS rows, the
# rest none).  Order therefore matters: oracle-paired queries first (hard
# rows+schema+hash checks), rows-only approximations last (weak rows-only
# checks); GATED is budgeted to exactly 50 so nothing falls off the end.
def ordered_queries() -> dict[str, QueryFn]:
    """Registry in gate order: oracle pairs in registration order, then
    rows-only queries."""
    pairs = [n for n in QUERIES if n in ORACLE]
    rows_only = [n for n in QUERIES if n not in ORACLE]
    return {n: QUERIES[n] for n in pairs + rows_only}
