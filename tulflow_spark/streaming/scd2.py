"""Streaming SCD Type 2: the incremental face of
``operators/cdc.py::scd2_history`` — an unbounded keyed change stream where
each arriving change CLOSES the key's open version (emitting it downstream
with its final validity interval) and opens a new one held in state.

Semantics (matching the batch operator):

- a change whose payload AND op match the previous log row (which,
  while a version is open, is exactly the row that opened it) is a
  NO-OP (coalesced away — versions represent real changes; an I->U
  transition with identical payload stays two versions, matching the
  batch operator's payload+op no-op signature);
- op = 'D' closes the open version without opening one;
- emitted rows are CLOSED versions only (``valid_from``/``valid_to``);
  the open versions are exactly the operator state — a snapshot sink or
  the batch operator over accumulated history serves point-in-time reads.

State: ONE row per key (the open version: valid_from + payload), bounded
by live-key cardinality regardless of stream length — same shape as the
engine's own dedup state (plus the opener's op when ``op_col`` is
given).  Within a micro-batch, ALL of a key's rows are gathered across
Arrow chunks and sorted by the sequence column once, so out-of-order
arrivals inside a batch apply correctly regardless of chunking;
cross-batch ordering is the source's contract (Kafka per-key ordering /
CDC log order), as with any stateful CDC consumer.

State-schema note: with ``op_col`` the state carries the opener's op
(added in round 6 for batch-parity no-op coalescing).  A checkpoint
written by the earlier payload-only state schema cannot restart on this
version — resume from a fresh checkpoint after upgrading, as with any
applyInPandasWithState schema change.
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def _norm(v):
    """Canonicalize a payload value for null-safe comparison: pandas
    hands NULL numerics over as NaN while state restores them as None —
    both must compare equal (the batch operator uses eqNullSafe)."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return v


def _update_factory(n_keys: int, payload: list[str], has_op: bool):
    np_ = len(payload)

    def update(key: tuple[Any, ...], batches, state: GroupState):
        if state.exists:
            # (valid_from, *payload[, opener_op])
            stored = state.get
            open_from = stored[0]
            open_payload = list(stored[1 : 1 + np_])
            open_op = stored[1 + np_] if has_op else None
            has_open = open_from is not None
        else:
            open_from, open_payload, open_op, has_open = (
                None, None, None, False,
            )
        out = []
        # applyInPandasWithState may deliver a key's batch rows as SEVERAL
        # Arrow chunks with no cross-chunk order guarantee — gather them
        # all, then sort by sequence ONCE
        chunks = [pdf for pdf in batches if len(pdf)]
        rows = (
            pd.concat(chunks).sort_values("_seq", kind="mergesort")
            if chunks
            else pd.DataFrame()
        )
        for _, r in rows.iterrows():
            seq = int(r["_seq"])
            vals = [r[c] for c in payload]
            op = str(r["_op"]) if has_op else None
            is_delete = has_op and op == "D"
            if has_open:
                # batch parity (operators/cdc.py drop_noop): a change is
                # a no-op iff payload AND op match the PREVIOUS log row —
                # which, while a version is open, is exactly its opener
                if (
                    not is_delete
                    and [_norm(v) for v in open_payload]
                    == [_norm(v) for v in vals]
                    and (not has_op or open_op == op)
                ):
                    continue
                out.append(
                    tuple(key) + tuple(open_payload) + (open_from, seq)
                )
                has_open = False
            if not is_delete:
                open_from, open_payload, open_op, has_open = (
                    seq, vals, op, True,
                )
        if has_open:
            st = [open_from] + list(open_payload)
            if has_op:
                st.append(open_op)
            state.update(tuple(st))
        elif state.exists:
            state.remove()
        cols = (
            [f"_k{i}" for i in range(n_keys)]
            + payload
            + ["valid_from", "valid_to"]
        )
        yield pd.DataFrame(out, columns=cols)

    return update


def stream_scd2(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    payload: list[str],
    op_col: str | None = None,
) -> DataFrame:
    """Change stream → CLOSED SCD2 version rows (append mode).

    ``seq_col`` must be a monotonically increasing LONG per key (CDC log
    offset, event sequence); ``op_col`` values I/U/D as in the batch
    operator.  Output: keys + payload + ``valid_from``/``valid_to``
    (both in ``seq_col`` units)."""
    cols = [F.col(k) for k in keys] + [
        F.col(seq_col).cast("long").alias("_seq")
    ] + [F.col(c) for c in payload]
    if op_col:
        cols.append(F.col(op_col).alias("_op"))
    keyed = changes.select(*cols)

    schema = keyed.schema
    by_name = {f.name: f for f in schema.fields}
    out_fields = (
        [StructField(f"_k{i}", by_name[k].dataType)
         for i, k in enumerate(keys)]
        + [by_name[c] for c in payload]
        + [StructField("valid_from", LongType()),
           StructField("valid_to", LongType())]
    )
    state_fields = [StructField("valid_from", LongType())] + [
        by_name[c] for c in payload
    ]
    if op_col:
        state_fields.append(StructField("_open_op", StringType()))
    out = keyed.groupBy(*keys).applyInPandasWithState(
        _update_factory(len(keys), payload, op_col is not None),
        outputStructType=StructType(out_fields),
        stateStructType=StructType(state_fields),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        *[F.col(f"_k{i}").alias(k) for i, k in enumerate(keys)],
        *payload,
        "valid_from",
        "valid_to",
    )


__all__ = ["stream_scd2"]
