"""Streaming temperature-mix: per-domain running counters over an
unbounded stream feeding the SAME temperature-rate arithmetic as the
batch mixer (ext/mixing.py::temperature_rates), so a streaming ingest can
hold a token-budget mix as the natural domain distribution drifts.

Two-stage contract, same shape as streaming/quality.py:

1. :func:`stream_domain_stats` — a stateful operator keyed by domain
   whose state is two LONG counters (docs seen, tokens seen).  Each
   micro-batch every updated domain emits its current totals in update
   mode.  State is #domains x 2 longs — fixed, stream-length-independent.
2. A batch consumer (foreachBatch or a periodic job) reduces the
   emissions with :func:`latest_stats` (counters are monotone, so the
   per-domain MAX of each emitted counter IS the latest emission — no
   batch-id bookkeeping needed), derives rates with
   ``ext.mixing.rates_from_stats`` (bit-identical rounding to the batch
   recipe), and applies them to incoming documents with the
   deterministic ``ext.mixing.hash_sample`` — map-only, no RNG, so a
   replay or a batch backfill selects byte-identical survivors.

The split mirrors how a production mixer actually runs: the rate model
updates at control-plane cadence (per batch or per N batches) while
selection stays a stateless map over the data plane.

No reference-repo analogue (the reference moves records, it doesn't mix
corpora); extends the streaming LLM-pipeline surface alongside
streaming/quality.py and streaming/neardup.py.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "domain string, n_docs long, tokens long"
_STATE_SCHEMA = "n long, tok long"


def _update(key: tuple[Any, ...], batches, state: GroupState):
    n, tok = state.get if state.exists else (0, 0)
    changed = False
    for pdf in batches:
        if len(pdf):
            n += int(len(pdf))
            # a NULL token count arrives as NaN in the pandas batch;
            # count it as 0 (matching F.sum's null-skipping in the batch
            # groupBy this operator is pinned bit-identical to)
            tok += int(pdf["_tok"].fillna(0).sum())
            changed = True
    if changed:
        state.update((n, tok))
        yield pd.DataFrame(
            {"domain": [str(key[0])], "n_docs": [n], "tokens": [tok]}
        )
    else:
        yield pd.DataFrame([], columns=["domain", "n_docs", "tokens"])


def stream_domain_stats(
    df: DataFrame, group_col: str, token_col: str
) -> DataFrame:
    """Document stream → update-mode rows (domain, n_docs, tokens): each
    updated domain's running totals.  Keyed state is two longs per
    domain; emissions are one row per updated domain per micro-batch.
    NULL-domain rows are dropped (a string state key would otherwise
    coerce them to the literal 'None', diverging from the batch groupBy);
    NULL token counts count as 0, matching F.sum's null skipping."""
    keyed = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("_domain"),
        F.col(token_col).cast("long").alias("_tok"),
    )
    return keyed.groupBy("_domain").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_stats(emissions: DataFrame, group_col: str = "domain") -> DataFrame:
    """Reduce accumulated update emissions to the newest per domain.
    Both counters are monotone non-decreasing and updated atomically, so
    per-domain MAX of each column equals the last emission — this works
    on an append-accumulating sink (e.g. memory or parquet) without any
    batch-id column.  Output shape matches ``rates_from_stats`` input:
    (group_col, _n, _tok)."""
    return emissions.groupBy(F.col(group_col)).agg(
        F.max("n_docs").alias("_n"), F.max("tokens").alias("_tok")
    )


__all__ = ["stream_domain_stats", "latest_stats"]
