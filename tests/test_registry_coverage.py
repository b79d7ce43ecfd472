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
    """The driver adjudicates ~50 entries: oracle-paired gate queries must
    number exactly 50 so none falls off the end unadjudicated."""
    assert len([n for n in QUERIES if n in ORACLE]) == 50
