"""Streaming frequent items: sharded Misra-Gries over micro-batches.

The incremental form of :func:`tulflow_spark.ext.sketches.heavy_hitters`:
keys are sharded by hash into ``buckets`` groups, and each group carries a
Misra-Gries summary (≤ ``width`` counters) in the state store across
micro-batches via ``applyInPandasWithState``.  Because a key lives in
exactly ONE shard, every occurrence of it folds into the same summary —
so with ``width`` at least a shard's distinct-key count the counters are
EXACT running counts, and below that they degrade gracefully to the MG
undercount bound (≤ n_shard/(width+1)), never overcount.

State is bounded at ``buckets × width`` counters regardless of stream
length or key cardinality — the property that keeps a 100 TB/day stream's
state store flat.  Update-mode emission: each micro-batch re-emits the
shards it touched (O(touched × width) rows per trigger).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tulflow_spark.ext.sketches import mg_merge_counts

_OUT_SCHEMA = "bucket int, item string, mg_count bigint"
_STATE_SCHEMA = "items array<string>, counts array<long>"


def _update_sketch_factory(width: int):
    def update(key: tuple[Any, ...], batches, state: GroupState):
        if state.exists:
            items, counts = state.get
            counters = dict(zip(items, (int(c) for c in counts)))
        else:
            counters = {}
        for pdf in batches:
            counters = mg_merge_counts(
                counters, pdf["_item"].value_counts().items(), width
            )
        state.update((list(counters.keys()), list(counters.values())))
        yield pd.DataFrame(
            {
                "bucket": [int(key[0])] * len(counters),
                "item": list(counters.keys()),
                "mg_count": list(counters.values()),
            }
        )

    return update


def streaming_frequent_items(
    stream: DataFrame,
    item_col: str,
    buckets: int = 16,
    width: int = 64,
) -> DataFrame:
    """Running frequent-item counters over a stream.

    Returns update-mode rows ``(bucket, item, mg_count)``; the current
    global candidate set is the latest emission per (bucket, item), and —
    as in the batch path — any item with true frequency > n/(width+1)
    within its shard is guaranteed present.  Downstream, an exact recount
    (batch ``heavy_hitters`` over the accumulated data) turns candidates
    into exact answers; the stream keeps the candidate set hot in real
    time without storing the key space."""
    keyed = stream.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(buckets))
        .cast("int")
        .alias("_bucket"),
        F.col(item_col).cast("string").alias("_item"),
    )
    return keyed.groupBy("_bucket").applyInPandasWithState(
        _update_sketch_factory(width),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = ["streaming_frequent_items"]
