"""Registry invariants (r3 VERDICT #8): the local parity suite must cover
exactly the de-gated (gate=False) oracle pairs, so a query held out of the
driver's 50-slot gate can't silently rot — any drift between the registries
and the parametrized test lists fails here, in CI, not in a later round."""

from __future__ import annotations

from tests import test_oracle_parity as parity
from tulflow_spark.plans import (
    EXTRA_ORACLE,
    EXTRA_QUERIES,
    ORACLE,
    QUERIES,
    load_all,
)

load_all()


def test_every_extra_oracle_has_a_query():
    assert set(EXTRA_ORACLE) <= set(EXTRA_QUERIES)


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


def test_gated_and_degated_names_disjoint():
    assert not (set(QUERIES) & set(EXTRA_QUERIES))


def test_parity_suite_covers_exactly_all_oracle_pairs():
    """WITH_ORACLE (the parametrized oracle-parity list) == every oracle
    pair, gated and de-gated; ROWS_ONLY covers every remaining query."""
    assert set(parity.WITH_ORACLE) == set(ORACLE) | set(EXTRA_ORACLE)
    assert set(parity.ROWS_ONLY) == (
        set(QUERIES) | set(EXTRA_QUERIES)
    ) - set(parity.WITH_ORACLE)
    assert set(EXTRA_ORACLE) <= set(parity.WITH_ORACLE)


def test_gate_budget():
    """The driver adjudicates ~50 entries: the gated registry must number
    exactly 50 so none falls off the end unadjudicated, with oracle pairs
    ordered before rows-only queries (hard checks can't be displaced by
    weak ones)."""
    from tulflow_spark.plans import GATED, ordered_queries

    names = list(ordered_queries())
    assert len(names) == 50
    assert set(names) == set(GATED) == set(QUERIES)
    n_pairs = len([n for n in names if n in ORACLE])
    assert all(n in ORACLE for n in names[:n_pairs])
    assert all(n not in ORACLE for n in names[n_pairs:])


def test_r7_rotation_promotes_never_adjudicated_pairs():
    """r6 VERDICT #1: every query never adjudicated in CORRECTNESS_r01..r06
    (20 of them, plus anything registered this round) must hold a
    driver-gate slot this round, completing cumulative adjudication at
    140/140 pre-r7 registrations."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    ever: set[str] = set()
    for p in root.glob("CORRECTNESS_r*.json"):
        ever |= set(json.loads(p.read_text()))
    never = (set(QUERIES) | set(EXTRA_QUERIES)) - ever
    # Queries added AFTER the r7 rotation froze can't displace the
    # promoted set (the gate budget is a hard 50) UNLESS they took a slot
    # in the same commit; names here run in the local parity suite this
    # round and queue for the r8 rotation.
    # r13 rotation: dl8/dl9/ib5/sdc2 promoted (r12 VERDICT #1) plus
    # the round's new dl10/sdc3 pairs gated on creation; ib4/dl7/ib6
    # still queue (r14), and dl11 (CDF × rename) registered after the
    # r13 gate froze
    # r14: ib4/dl11/dl12/ic1/dl13 promoted into the gate; dl7/ib6
    # remain queued for the r15 rotation, joined by the five
    # r14-created pairs (Iceberg DML writers, Delta merge evolution,
    # the Iceberg CDF streaming source)
    # r15: ic2/ic3/ic4/dl14/sdc4 promoted into the gate (r14 VERDICT
    # #1); dl7/ib6/ic5 queue for the r16 rotation, joined by any
    # r15-created pairs registered after the r15 gate froze.
    added_post_rotation: set[str] = {"dl7_column_mapping_id",
                                     "ib6_ref_travel",
                                     "ic5_iceberg_merge_evolve",
                                     # r15-created after the gate froze
                                     # (eq→pos conversion; pos-delete
                                     # consolidation; Delta DV purge)
                                     "ic7_convert_eq_cdf",
                                     "ic8_pos_rewrite_cdf",
                                     "dl15_dv_purge_cdf"}
    never -= added_post_rotation
    assert never <= set(QUERIES), (
        f"never-adjudicated but de-gated: {sorted(never - set(QUERIES))}"
    )
    # the 20 r6-verdict names completed cumulative adjudication in r7;
    # since then the durable invariant is a driver row in SOME round
    # (they may rotate out of the gate for fresh pairs)
    r6_verdict_queue = {
        "a13_grouping_sets", "bm1_bm25_search", "bm2_phrase_search",
        "cdc3_scd2_history", "cur6_training_mix", "cur7_clean_corpus",
        "dc1_decontaminate", "dd12_cluster_stats", "j6_range_join",
        "mm7_png16_roundtrip", "mx8_temperature_mix", "pack1_token_sequences",
        "pr2_drift_psi", "rr1_rerank_topk", "rr2_search_rerank",
        "sp1_hash_split", "ss9_ivfpq_topk", "ss10_int8_quant",
        "x6_dynamic_xpath", "zo2_zorder3_layout",
    }
    assert r6_verdict_queue <= ever


def test_gate_validated_at_import_time():
    """r6 VERDICT #8: a GATED typo must fail loudly at load_all() time, not
    silently shrink the driver gate (register() routes unknown names to
    EXTRA_*)."""
    import pytest

    import tulflow_spark.plans as plans

    orig = plans.GATED
    try:
        plans.GATED = frozenset(orig | {"zz_typo_not_registered"})
        with pytest.raises(RuntimeError, match="not registered"):
            plans.load_all()
    finally:
        plans.GATED = orig
