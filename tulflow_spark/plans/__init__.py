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
# Round-8 rotation: r7 completed cumulative adjudication (every
# registered query has a driver row in some round), so r8 keeps the r7
# gate except one swap — q14_promo_revenue (driver rows r1/r6; TPC-H
# keeps the q01/q03/q05 anchors) rotates out for the new
# mm10_mp3_roundtrip pair.  ss9_ivfpq_topk, rows-only through r7, now
# carries a full DuckDB oracle (seeded-parity IVFADC) and sorts into the
# oracle-pair prefix — the gate is 50/50 hash-checkable.
GATED: frozenset[str] = frozenset(
    {
        # r7-promoted oracle pairs, kept
        # r9: a13_grouping_sets rotated out (driver rows r7+r8; the OLAP
        # family keeps q01/q03/q05/sk1) for the Delta change-feed pair
        # r12: dl4_delta_changes rotated out (driver rows r9/r10/r11;
        # dl1/dl3/dl5/dl6 keep the Delta anchors) for the Delta
        # change-feed STREAMING pair — the r11-created source's first
        # driver adjudication (r11 VERDICT #1)
        "sdc1_stream_delta_changes",
        # r13: promote four of the seven r12-created pairs that have
        # never had a driver CORRECTNESS row (r12 VERDICT #1 —
        # judge-verified green via vanilla gate_sim, now adjudicated
        # for real).  ib4/ib6/dl7 queue for r14.
        "dl8_v2_checkpoint",
        "dl9_change_feed",
        "ib5_iceberg_v3_dv",
        "sdc2_stream_iceberg_changes",
        # r13: the new Delta MERGE + CDF-images pair (r12 VERDICT #2),
        # gated in place of x4_transform_rules (driver rows r2..r12;
        # x2b/x3 keep the XML-family anchors)
        "dl10_merge_cdf",
        # r13: the CDF streaming-source pair (r12 VERDICT #3), gated
        # in place of q05_region_revenue (driver rows r1..r12; TPC-H
        # keeps the q01/q03 anchors)
        "sdc3_stream_delta_cdf",
        # r14 (2026-08-16): promote five of the seven r12/r13-created
        # pairs with no driver CORRECTNESS row (r13 VERDICT #1 — all
        # seven judge-verified green via vanilla gate_sim; dl7/ib6
        # queue for r15).  Rotated out, keeping one anchor per family:
        # dd1_exact_dedup (13 driver rows; dd10/dd12 keep dedup),
        # q01_pricing_summary (13; q03 keeps TPC-H), x2b_marc_native
        # (12; x3 keeps XML), cdc2_merge_upsert (8; zo1 keeps the
        # manifest-snapshot family), cur5_web_pipeline (8; cur7 keeps
        # curation).
        "ic1_iceberg_cdf",
        "dl12_update_cdf",
        "dl13_restore_cdf",
        "dl11_cdf_rename",
        "ib4_iceberg_rename",
        # r15 (2026-08-16): promote five of the eight queued pairs with
        # no driver CORRECTNESS row (r14 VERDICT #1 — all eight verified
        # green via vanilla gate_sim by both the r14 build session and
        # the r14 judge; ic5/dl7/ib6 queue for r16), prioritizing the
        # ones exercising the most r14 code.  Rotated out, keeping one
        # anchor per family: vr1_approx_bounds (13 driver rows;
        # ss8/ss9/ss10 keep ANN — the 11 recall/error floors stay
        # enforced by the local parity suite), dd10_repeated_spans (9;
        # dd12 keeps dedup), mx7_quality_mix_approx (9; pack1/tr1 keep
        # mixing), rr2_search_rerank (8; rr1/rr4 keep re-rank),
        # mm9_audio_features (8; mm10/mm11 keep media).
        "ic2_merge_iceberg_cdf",
        "ic3_iceberg_update_cdf",
        "ic4_iceberg_restore_cdf",
        "dl14_merge_evolve_cdf",
        "sdc4_stream_iceberg_cdf",
        # r15: the new equality-delete-aware streaming changelog pair
        # (r14 VERDICT #2 — merge_iceberg output streaming through
        # tulflow_iceberg_cdf), gated on creation in place of
        # tr1_train_shuffle (9 driver rows; pack1 keeps the
        # training-data-plumbing anchor)
        "sdc5_stream_merge_cdf",
        # r15: the new v3 UPDATE pair (r14 VERDICT #6 — DV + data in
        # one atomic snapshot), gated on creation in place of
        # ss10_int8_quant (8 driver rows; ss8/ss9 keep the quantized-
        # ANN anchors)
        "ic6_v3_update_cdf",
        # r16 (2026-08-18): promote ALL six oracle pairs with no driver
        # CORRECTNESS row in any round (r15 VERDICT #6 — cumulative
        # adjudication first; every one verified green via vanilla
        # gate_sim this round), plus rotate vr1_approx_bounds back in
        # (one of r15's seven rotated-out; its 11 recall/error floors
        # return to hard driver adjudication).  Rotated out, keeping
        # one anchor per family: tx2_quality_scores (14 driver rows;
        # tx15 keeps text), ss9_ivfpq_topk (9; ss8 keeps ANN),
        # rr1_rerank_topk (9; rr4 keeps re-rank), mm10_mp3_roundtrip
        # (8; mm11 keeps media), dl1_delta_timetravel (8) and
        # dl3_delta_skipping (7; dl5/dl6/dl8-dl15 keep Delta),
        # warc1_warc_ingest (6; warc2 keeps WARC).
        "ic5_iceberg_merge_evolve",
        "ic7_convert_eq_cdf",
        "ic8_pos_rewrite_cdf",
        "dl7_column_mapping_id",
        "ib6_ref_travel",
        "dl15_dv_purge_cdf",
        "vr1_approx_bounds",
        "bm1_bm25_search",
        # r10: cdc3_scd2_history rotated out (driver rows r7/r8/r9;
        # cdc2 keeps the CDC anchor) for the deletion-vector pair
        "dl5_deletion_vectors",
        # r9: zo2_zorder3_layout and bm2_phrase_search rotated out
        # (driver rows r7+r8; zo1/bm1 keep their family anchors) to
        # budget slots for the new Delta OPTIMIZE and data-skipping
        # pairs
        # r11: dl2_delta_optimize rotated out (driver rows r9+r10;
        # dl1/dl3/dl4/dl5 keep the Delta anchors) for the new
        # column-mapping pair
        "dl6_column_mapping",
        # r9: cur6_training_mix rotated out (driver rows r7+r8; cur5/
        # cur7 keep the curation anchors) for the robots.txt filter pair
        "url2_robots_filter",
        "cur7_clean_corpus",
        "dc1_decontaminate",
        "dd12_cluster_stats",
        # r10: j6_range_join rotated out (driver rows r7/r8/r9; j1/aj1
        # keep the join anchors) for ss8_pq_topk — the ONLY oracle pair
        # of 146 with no driver row under its r8 seeded oracle (r9
        # VERDICT #1: closes the last adjudication gap)
        "ss8_pq_topk",
        # r9: mx8_temperature_mix and sp1_hash_split rotated out (driver
        # rows r7+r8; mx7/pack1 keep the mixing-family anchors) for the
        # KMV/theta sketch pairs — cardinality AND set intersection,
        # estimates hash-checked bit-for-bit
        # r11: st1_kmv_cardinality rotated out (driver rows r9+r10; st2
        # keeps the sketch anchor) for the Iceberg snapshot-read pair
        "ib1_iceberg_read",
        # r12: st2_kmv_intersection rotated out (driver rows r9..r11 for
        # the sketch family; st1 r9/r10) for the Iceberg equality-delete
        # pair — the last oracle pair with no driver hash-green row
        # (r11 VERDICT #1)
        "ib3_iceberg_eq_deletes",
        "pack1_token_sequences",
        # r9: pr2_drift_psi rotated out (driver rows r7+r8; pr1 keeps
        # the profile-family anchor) for the mojibake-repair pair
        # r11: tx14_mojibake_repair rotated out (driver rows r9+r10;
        # tx2/tx15 keep the text anchors) for the Iceberg
        # incremental-changes pair
        "ib2_iceberg_changes",
        # r9: x6_dynamic_xpath rotated out (driver rows r7+r8; x2b/x3/x4
        # keep the XML-family anchors) for the Aho-Corasick blocklist
        # pair
        "tx15_blocklist_hits",
        # oracle-paired since r8 (seeded-parity IVFADC; the production
        # iterative fit keeps its recall floor in vr1)
        # kept anchors
        "q03_top_revenue_orders",
        # r8: q14_promo_revenue rotated out (TPC-H keeps three anchors;
        # q14 stays in the local parity suite) to budget the slot for
        # the new MP3 decode pair
        # r10: dd3_ngram_jaccard rotated out (driver rows r1..r9; dd1/
        # dd10/dd12 keep the dedup anchors) for the WARC ingest pair
        # r13: aj1_asof_join rotated out (driver rows r2..r12; j1
        # keeps the join anchor) for dl9_change_feed
        "x3_validation_rules",
        # r13: ev2_sessionize rotated out (driver rows r2..r12; w1
        # keeps the window/event anchor) for ib5_iceberg_v3_dv
        "w1_topk_per_group",
        # r13: f1_md5_content_keys rotated out (driver rows
        # r1..r12; tx2 keeps the scalar-function anchor) for
        # sdc2_stream_iceberg_changes
        "j1_broadcast_enrich",
        # r13: sk1_salted_sum rotated out (driver rows every round
        # r1..r12 — the most-adjudicated query in the registry; the
        # local parity suite keeps it covered) for dl8_v2_checkpoint
        "zo1_zorder_layout",
        "pg1_pagerank",
        # new this round: audio feature stage over Vorbis, driver-gated
        # in place of the tx13 anchor (driver row r6)
        "pr1_profile_lineitem",
        # r10: mm8_vorbis_roundtrip rotated out (driver rows r6..r9;
        # mm9/mm10/mm11 keep the media anchors) for the PDF extraction
        # pair
        "pdf1_pdf_extract",
        # r9: mm7_png16_roundtrip rotated out (driver rows r7/r8; the
        # media family keeps mm8/mm9/mm10) to budget the slot for the
        # new FLAC decode pair
        "mm11_flac_roundtrip",
        # r8: mm1_media_roundtrip rotated out (driver rows r4/r7; the
        # media family keeps mm7/mm8/mm9/mm10) to budget the slot for
        # the new Delta-log-protocol pair
        # r8: url1_canonical_dedup rotated out (driver row r7; the dedup
        # family keeps dd1/dd3/dd10/dd12) to budget the slot for the new
        # ONNX scorer-slot pair
        "rr4_onnx_rerank",
        # r10: rr3_numeric_rerank rotated out (driver rows r6..r9; rr1/
        # rr2/rr4 keep the re-rank anchors) for the raw-WARC crawl
        # composition pair
        "warc2_crawl_pipeline",
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
    """Import every plan module so registration side effects run.

    Validates the gate afterwards (r6 VERDICT #8): a GATED typo would
    otherwise silently shrink the driver gate — ``register`` routes an
    unrecognized name to EXTRA_* and nothing would notice until the round's
    CORRECTNESS artifact came back short.
    """
    from tulflow_spark.plans import (  # noqa: F401
        ext_queries,
        ingest_queries,
        olap_queries,
        star_queries,
        tpch_extras,
        web_queries,
        xml_queries,
    )

    dangling = GATED - set(QUERIES)
    if dangling:
        raise RuntimeError(
            f"GATED names not registered (typo in the rotation?): "
            f"{sorted(dangling)}"
        )
    if len(GATED) != 50 or len(QUERIES) != 50:
        raise RuntimeError(
            f"driver gate must hold exactly 50 queries, got "
            f"|GATED|={len(GATED)} |QUERIES|={len(QUERIES)}"
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
