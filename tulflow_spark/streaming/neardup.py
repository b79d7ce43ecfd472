"""Streaming MinHash near-duplicate detection: the streaming face of
``ext.dedup.minhash_lsh_pairs`` — an unbounded document stream where each
arriving document is checked against everything seen so far (across
micro-batches) via banded-LSH state, without ever holding document bodies
in state.

Shape (same doctrine as the batch path + ``streaming/frequent.py``):

- signatures and band keys are pure map-side column algebra (the SAME
  ``minhash_signature``/``band_keys`` the batch path uses — one pipeline,
  two execution modes);
- state is keyed by band bucket (``applyInPandasWithState``): each bucket
  holds up to ``max_bucket`` (doc_id, signature) entries — k longs per
  doc, never text — so state is bounded at buckets × max_bucket × k;
- an arriving document that shares a band with a stored one is compared
  by signature-agreement fraction (the unbiased Jaccard estimate; exact
  re-verification needs bodies and belongs to a downstream batch join on
  the emitted candidate pairs, exactly like the batch path's verify step);
- emitted rows: ``(doc_id, dup_of, est_jaccard)`` — at most one row per
  (new doc, stored doc) per shared band; downstream dedups pairs seen
  via multiple bands (same as batch LSH).

Overflowing buckets drop the OLDEST entries first (crawl recency bias —
the cap trades recall for bounded state, the same contract as the batch
``max_bucket`` with its overcap observable).

Signature-scheme note: signatures persist in the streaming state store,
so upgrading the MinHash hash family (ext.dedup.minhash_signature_from_
hashes — per-component seeded murmur3 since round 6) INVALIDATES old
checkpoints: restart the query from a fresh checkpoint after such an
upgrade, or every historical near-duplicate is silently re-admitted.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tulflow_spark.ext.dedup import band_keys, minhash_signature, word_shingles

_OUT_SCHEMA = "doc_id bigint, dup_of bigint, est_jaccard double"
_STATE_SCHEMA = "ids array<long>, sigs array<array<long>>"


def _update_factory(threshold: float, max_bucket: int,
                    ttl_ms: int | None = None):
    def update(key: tuple[Any, ...], batches, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            # idle bucket expired: drop its signatures entirely — the
            # knob that makes total state corpus-INDEPENDENT (recent
            # window only) instead of corpus-linear-until-cap
            state.remove()
            yield pd.DataFrame(
                [], columns=["doc_id", "dup_of", "est_jaccard"]
            )
            return
        if state.exists:
            ids, sigs = state.get
            ids = list(ids)
            sigs = [list(s) for s in sigs]
        else:
            ids, sigs = [], []
        out_rows = []
        for pdf in batches:
            for _, r in pdf.iterrows():
                doc_id = int(r["doc_id"])
                sig = [int(x) for x in r["_sig"]]
                for known_id, known_sig in zip(ids, sigs):
                    if known_id == doc_id:
                        continue
                    agree = sum(
                        1 for a, b in zip(sig, known_sig) if a == b
                    ) / len(sig)
                    if agree >= threshold:
                        out_rows.append(
                            {
                                "doc_id": doc_id,
                                "dup_of": known_id,
                                "est_jaccard": agree,
                            }
                        )
                ids.append(doc_id)
                sigs.append(sig)
        if len(ids) > max_bucket:  # oldest-first eviction
            ids = ids[-max_bucket:]
            sigs = sigs[-max_bucket:]
        state.update((ids, sigs))
        if ttl_ms is not None:
            # sliding idle-expiry: every batch that touches the bucket
            # re-arms the clock
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            out_rows, columns=["doc_id", "dup_of", "est_jaccard"]
        )

    return update


def stream_minhash_neardup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    max_bucket: int = 1000,
    state_ttl_minutes: float | None = None,
) -> DataFrame:
    """Document stream → candidate near-dup pairs across ALL micro-batches
    seen so far.  ``threshold`` is on the signature-agreement estimate of
    Jaccard; band/row amplification matches the batch operator (bands ×
    rows = k).

    ``state_ttl_minutes`` bounds TOTAL state independently of corpus size:
    a band bucket idle for that long is evicted wholesale (processing-time
    timeout), trading recall against very old documents for a
    recent-window memory footprint — the operational knob SCALE.md §5's
    probe motivates (without it, state grows linearly with distinct
    buckets until each hits ``max_bucket``)."""
    rows = k // bands
    sig = minhash_signature(word_shingles(F.col(text_col), n=n), k=k)
    keyed = (
        docs.select(F.col(id_col).alias("doc_id"), sig.alias("_sig"))
        .withColumn("_band", F.explode(band_keys(F.col("_sig"), bands, rows)))
    )
    ttl_ms = (
        int(state_ttl_minutes * 60_000)
        if state_ttl_minutes is not None
        else None
    )
    return keyed.groupBy("_band").applyInPandasWithState(
        _update_factory(threshold, max_bucket, ttl_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


__all__ = ["stream_minhash_neardup"]
