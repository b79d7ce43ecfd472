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
# Round-6 rotation (r5 VERDICT #1): the 31 oracle pairs the driver has
# NEVER adjudicated (missed every 50-slot gate since registration) are all
# promoted — this is the round's whole point, converting the last
# locally-green-only 26% of the registry into hard driver rows.  All r5
# gate members rotate OUT to the local parity suite except 18 kept anchors:
# veterans whose code this round touches (html.py -> cur3/cur4; media
# probes covered by the promoted mm1-mm6; mixing -> mx6/mx7) plus one
# flagship per module family so every subsystem keeps a fresh driver row.
GATED: frozenset[str] = frozenset(
    {
        # never-adjudicated oracle pairs, promoted (30)
        "a12_rollup",
        "cdc2_merge_upsert",
        "cur5_web_pipeline",
        "dd10_repeated_spans",
        "mm1_media_roundtrip",
        "mm2_png_roundtrip",
        "mm3_wav_roundtrip",
        "mm4_mp3_probe",
        "mm5_ogg_id3_probe",
        "mm6_mp4_probe",
        "mx6_quality_mix",
        "pg1_pagerank",
        "pr1_profile_lineitem",
        "q02_min_acctbal_supplier",
        "q07_nation_volume",
        "q08_market_share",
        "q09_product_profit",
        "q11_important_parts",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q18_large_volume",
        "q20_promotable_suppliers",
        "q21_sole_return_supplier",
        "q22_dormant_customers",
        "tr1_train_shuffle",
        "tx13_html_extract",
        "url1_canonical_dedup",
        "w5_month_delta",
        "w6_moving_avg",
        "zo1_zorder_layout",
        # never-adjudicated rows-only query (1): BPE merge table — quality
        # oracle-gated locally (merge-exact vs independent trainer)
        "tx12_bpe_merges",
        # new this round (1): scale variant of quality mixing, driver-gated
        # so the production path (not just the exact NTILE) gets a hard row
        "mx7_quality_mix_approx",
        # kept anchors (18)
        "q01_pricing_summary",
        "q03_top_revenue_orders",
        "q05_region_revenue",
        "q14_promo_revenue",
        "dd1_exact_dedup",
        "dd3_ngram_jaccard",
        "aj1_asof_join",
        "vr1_approx_bounds",
        "x2b_marc_native",
        "x4_transform_rules",
        "cur3_strip_boilerplate",
        "cur4_full_pipeline",
        "ev2_sessionize",
        "w1_topk_per_group",
        "f1_md5_content_keys",
        "j1_broadcast_enrich",
        "tx2_quality_scores",
        "sk1_salted_sum",
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
