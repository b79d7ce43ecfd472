"""Streaming KMV distinct-count sketches: the incremental form of
:mod:`tulflow_spark.ext.theta` over micro-batches.

Each group carries its k minimum value-hashes in the state store via
``applyInPandasWithState`` — bounded at ``k`` 8-byte hashes per group
REGARDLESS of stream length or value cardinality, the property that
keeps a 100 TB/day stream's state flat (the `streaming/frequent.py`
shape, with the KMV estimator instead of Misra-Gries counters).

Because a KMV sketch is a pure function of the SET of hashes seen, the
streaming sketch after N micro-batches is IDENTICAL to the batch
sketch over the concatenated input — order- and batching-insensitive —
so the equivalence test is exact, not approximate, and estimates match
:func:`tulflow_spark.ext.theta.kmv_estimate` bit-for-bit (same
md5-derived hash, same integral floor-division estimator).

Update-mode emission: each micro-batch re-emits the groups it touched
with their current ``(estimate, kept)``.
"""

from __future__ import annotations

import hashlib
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_SCALE = 1 << 60
_OUT_SCHEMA = "group string, estimate bigint, kept int"
_STATE_SCHEMA = "hashes array<long>"


def _kmv_hash_py(value: str) -> int:
    """CPython mirror of theta.kmv_hash (identical md5-prefix hash)."""
    return int(hashlib.md5(value.encode("utf-8")).hexdigest()[:15], 16)


def _estimate(hashes: list[int], k: int) -> int:
    if len(hashes) < k:
        return len(hashes)
    return (k - 1) * _SCALE // (hashes[k - 1] + 1)


def _update_factory(k: int):
    def update(key: tuple[Any, ...], batches, state: GroupState):
        if state.exists:
            kept = {int(h) for h in state.get[0]}
        else:
            kept = set()
        for pdf in batches:
            # a key's rows may arrive as MULTIPLE chunks in any order —
            # fold each into the set; the sketch is order-insensitive
            for v in pdf["_value"]:
                if v is not None:
                    kept.add(_kmv_hash_py(str(v)))
        smallest = sorted(kept)[:k]
        if not smallest:
            # only NULL values so far: the batch sketch (which filters
            # NULLs pre-hash) has NO row for this group — emitting a
            # phantom zero here would break the exact equivalence
            return
        state.update((smallest,))
        yield pd.DataFrame(
            {
                # a NULL group stays NULL (str(None) would collide with
                # a real group literally named 'None')
                "group": [str(key[0]) if key[0] is not None else None],
                "estimate": [_estimate(smallest, k)],
                "kept": [len(smallest)],
            }
        )

    return update


def streaming_cardinality(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Running per-group distinct-count estimates over a stream.

    Returns update-mode rows ``(group, estimate, kept)``; the latest
    emission per group is the current estimate — exact below ``k``
    distinct values, KMV-estimated above, and byte-identical to the
    batch :func:`ext.theta.kmv_estimate` over the same accumulated
    input (pinned by the streaming==batch equivalence test)."""
    if k < 2:
        raise ValueError("kmv needs k >= 2 (theta is the k-th minimum)")
    keyed = stream.select(
        F.col(group_col).cast("string").alias("_group"),
        F.col(value_col).cast("string").alias("_value"),
    )
    return keyed.groupBy("_group").applyInPandasWithState(
        _update_factory(k),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = ["streaming_cardinality"]
