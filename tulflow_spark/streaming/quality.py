"""Streaming quality thresholds: maintain quantile cut-points of a score
column over an unbounded stream — the streaming face of the quality-mix
threshold derivation (ext/mixing.py::quality_mix_approx uses a one-shot
percentile_approx; a stream needs thresholds that update as data arrives,
e.g. "keep the top quartile of documents seen so far").

Mechanism: a DETERMINISTIC bounded uniform sample per hash shard — each
shard's state keeps the ``per_shard`` (score, md5-order-key) pairs with
the SMALLEST order keys seen so far.  k-smallest-of-a-uniform-hash is an
exchangeable uniform sample of the shard's history (the bottom-k sketch:
same family as KMV distinct-count estimators), is insensitive to arrival
order and batching, and — unlike an RNG reservoir — is REPRODUCIBLE: any
engine replaying the stream derives the same sample, hence the same
thresholds.  Each micro-batch every updated shard emits its current
sample; thresholds come from a tiny batch aggregate over the union of
shard samples (shards × per_shard rows).

State: shards × per_shard (score, 16-hex-char key) rows — fixed, stream-
length-independent.  Quantile error is sampling error at the union sample
size (shards × per_shard), not sketch drift.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "shard int, score double, ok string"
_STATE_SCHEMA = "scores array<double>, oks array<string>"


def _update_factory(per_shard: int):
    def update(key: tuple[Any, ...], batches, state: GroupState):
        if state.exists:
            scores, oks = state.get
            pairs = list(zip(list(oks), list(scores)))
        else:
            pairs = []
        changed = False
        for pdf in batches:
            for _, r in pdf.iterrows():
                pairs.append((str(r["_ok"]), float(r["_score"])))
                changed = True
        if changed:
            pairs.sort()  # lexicographic on fixed-width hex = numeric
            pairs = pairs[:per_shard]
            state.update(
                ([p[1] for p in pairs], [p[0] for p in pairs])
            )
            yield pd.DataFrame(
                {
                    "shard": [int(key[0])] * len(pairs),
                    "score": [p[1] for p in pairs],
                    "ok": [p[0] for p in pairs],
                }
            )
        else:
            yield pd.DataFrame([], columns=["shard", "score", "ok"])

    return update


def stream_score_sample(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    shards: int = 16,
    per_shard: int = 64,
) -> DataFrame:
    """Score stream → update-mode rows (shard, score, ok): each updated
    shard's CURRENT bottom-k uniform sample.  A downstream batch consumer
    takes the latest emission per shard (the usual update-mode contract)
    and computes thresholds with :func:`thresholds_from_sample`."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":qsample")))
    keyed = scored.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
        .cast("int")
        .alias("_shard"),
        F.col(score_col).cast("double").alias("_score"),
        F.substring(key, 1, 16).alias("_ok"),
    )
    return keyed.groupBy("_shard").applyInPandasWithState(
        _update_factory(per_shard),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def thresholds_from_sample(
    sample: DataFrame, probs: list[float]
) -> list[float]:
    """Exact percentiles over the (tiny) union sample — the same
    rank-at-ceil(p*n) pick the batch mixer's exact-mode sketch makes."""
    row = sample.agg(
        F.percentile_approx("score", probs, 1_000_000).alias("t")
    ).head()
    return [float(x) for x in row["t"]]


__all__ = ["stream_score_sample", "thresholds_from_sample"]
