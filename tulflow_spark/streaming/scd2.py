"""Streaming SCD Type 2: the incremental face of
``operators/cdc.py::scd2_history`` — an unbounded keyed change stream where
each arriving change CLOSES the key's open version (emitting it downstream
with its final validity interval) and opens a new one held in state.

Semantics (matching the batch operator):

- an update with a payload identical to the open version is a NO-OP
  (coalesced away — versions represent real changes);
- op = 'D' closes the open version without opening one;
- emitted rows are CLOSED versions only (``valid_from``/``valid_to``);
  the open versions are exactly the operator state — a snapshot sink or
  the batch operator over accumulated history serves point-in-time reads.

State: ONE row per key (the open version: valid_from + payload), bounded
by live-key cardinality regardless of stream length — same shape as the
engine's own dedup state.  Within a micro-batch, changes sort by the
sequence column so out-of-order arrivals inside a batch apply correctly;
cross-batch ordering is the source's contract (Kafka per-key ordering /
CDC log order), as with any stateful CDC consumer.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def _update_factory(n_keys: int, payload: list[str], has_op: bool):
    def update(key: tuple[Any, ...], batches, state: GroupState):
        if state.exists:
            stored = state.get  # (valid_from, *payload) or cleared marker
            open_from = stored[0]
            open_payload = list(stored[1:])
            has_open = open_from is not None
        else:
            open_from, open_payload, has_open = None, None, False
        out = []
        for pdf in batches:
            pdf = pdf.sort_values("_seq", kind="mergesort")
            for _, r in pdf.iterrows():
                seq = int(r["_seq"])
                vals = [r[c] for c in payload]
                is_delete = has_op and r["_op"] == "D"
                if has_open:
                    if not is_delete and list(open_payload) == list(vals):
                        continue  # no-op update: coalesce
                    out.append(
                        tuple(key) + tuple(open_payload)
                        + (open_from, seq)
                    )
                    has_open = False
                if not is_delete:
                    open_from, open_payload, has_open = seq, vals, True
        if has_open:
            state.update(tuple([open_from] + list(open_payload)))
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
