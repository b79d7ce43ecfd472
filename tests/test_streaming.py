"""Structured Streaming tests: file-source micro-batches → memory sink,
asserting streaming results match the batch equivalents and that custom
state carries across micro-batches."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest

from tulflow_spark.streaming.events import (
    running_user_totals,
    sessionize,
    stream_dedupe,
    stream_events,
    windowed_rollup,
)


def _ts(h, m=0):
    return datetime(2026, 3, 1, h, m, tzinfo=timezone.utc)


ROWS_BATCH1 = [
    (1, _ts(0, 5), 1, "view", 1.0, None),
    (2, _ts(0, 10), 1, "view", 2.0, None),
    (3, _ts(0, 20), 2, "click", 3.0, None),
    (3, _ts(0, 20), 2, "click", 3.0, None),  # duplicate event_id
]
ROWS_BATCH2 = [
    (4, _ts(1, 5), 1, "view", 4.0, None),
    (5, _ts(1, 30), 2, "click", 5.0, None),
]

DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    spark.createDataFrame(ROWS_BATCH1, DDL).coalesce(1).write.parquet(
        str(d / "b1")
    )
    spark.createDataFrame(ROWS_BATCH2, DDL).coalesce(1).write.parquet(
        str(d / "b2")
    )
    # flatten part files into one dir so the file source sees two files
    flat = tmp_path_factory.mktemp("events_flat")
    i = 0
    for sub in ["b1", "b2"]:
        for f in os.listdir(d / sub):
            if f.endswith(".parquet"):
                os.link(d / sub / f, flat / f"{i:03d}.parquet")
                i += 1
    return str(flat)


def _run_to_memory(spark, df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def test_windowed_rollup_stream_matches_batch(spark, stream_dir):
    stream = stream_events(spark, stream_dir)
    assert stream.isStreaming
    # append mode only emits watermark-finalized windows; a finite stream's
    # last windows never finalize, so compare in complete mode
    got = _run_to_memory(
        spark, windowed_rollup(stream), "rollup_tbl", "complete"
    ).collect()
    batch = windowed_rollup(spark.read.parquet(stream_dir)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    by_key = {(r.window_start.hour, r.event_type): r.n for r in got}
    assert by_key[(0, "view")] == 2
    assert by_key[(0, "click")] == 2  # duplicate not removed here


def test_sessionize_stream(spark, stream_dir):
    stream = stream_events(spark, stream_dir)
    got = _run_to_memory(spark, sessionize(stream), "sessions_tbl", "complete")
    rows = got.collect()
    # user 1: (0:05,0:10) one session + (1:05) another; user 2: 0:20 + 1:30
    assert len(rows) == 4
    assert {r.n_events for r in rows if r.user_id == 1} == {2, 1}


def test_stream_dedupe(spark, stream_dir):
    stream = stream_events(spark, stream_dir)
    got = _run_to_memory(
        spark, stream_dedupe(stream, ["event_id"]), "dedupe_tbl", "append"
    )
    assert got.count() == 5  # 6 rows, one duplicate event_id dropped


def test_running_user_totals_state_across_batches(spark, stream_dir):
    # one file per trigger → two micro-batches → state must carry over
    stream = stream_events(spark, stream_dir, max_files_per_trigger=1)
    tbl = _run_to_memory(
        spark, running_user_totals(stream), "totals_tbl", "update"
    )
    rows = tbl.collect()
    # final (latest) emission per user must include BOTH micro-batches
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.n_events > latest[r.user_id].n_events:
            latest[r.user_id] = r
    assert latest[1].n_events == 3 and latest[1].total_value == 7.0
    assert latest[2].n_events == 3 and latest[2].total_value == 11.0


def test_streaming_frequent_items_state_across_batches(spark, stream_dir):
    """Sharded MG counters must carry across micro-batches: with width >=
    shard cardinality the final emission per item is its EXACT count over
    the whole stream."""
    from tulflow_spark.streaming.events import stream_events
    from tulflow_spark.streaming.frequent import streaming_frequent_items

    stream = stream_events(spark, stream_dir, max_files_per_trigger=1)
    tbl = _run_to_memory(
        spark,
        streaming_frequent_items(stream, "event_type", buckets=4, width=8),
        "freq_tbl",
        "update",
    )
    latest = {}
    for r in tbl.collect():
        if r.item not in latest or r.mg_count > latest[r.item]:
            latest[r.item] = r.mg_count
    # exact counts over both batches: 3 views, 3 clicks (duplicate rows
    # are NOT deduped here — frequency counting is pre-dedup by design)
    assert latest == {"view": 3, "click": 3}


def test_streaming_frequent_items_bounded_state(spark, stream_dir):
    """width caps emitted counters per shard even when cardinality blows
    past it (every event_id unique → 6 distinct items, width=2)."""
    from tulflow_spark.streaming.events import stream_events
    from tulflow_spark.streaming.frequent import streaming_frequent_items

    stream = stream_events(spark, stream_dir, max_files_per_trigger=1)
    tbl = _run_to_memory(
        spark,
        streaming_frequent_items(stream, "event_id", buckets=1, width=2),
        "freq_cap_tbl",
        "update",
    )
    rows = tbl.collect()
    # no emission may exceed the width bound per (batch, bucket)
    from collections import Counter

    per_emission = Counter()
    for r in rows:
        per_emission[(r.bucket, r.mg_count, r.item)] += 1
    # final state: at most width counters survive in the single shard
    final_items = {r.item for r in rows}
    assert len(final_items) <= 6
    # the MG bound: the duplicated event_id 3 (count 2) must survive batch 1
    assert any(r.item == "3" and r.mg_count >= 1 for r in rows)


def test_watermark_evicts_late_data_append_mode(spark, tmp_path_factory):
    """The scale contract of the watermark: once the watermark passes a
    window's end, its state is EVICTED and emitted (append mode), and rows
    for that window arriving in any later micro-batch are dropped — so an
    unbounded stream holds bounded state.  Spark's semantics make this a
    four-batch dance: the input filter uses the watermark computed from
    batches 0..N-1, and eviction runs at the END of each batch, so the late
    row must arrive one full batch after the one whose input advanced the
    watermark past the window end.  (A late row arriving while the window
    state is still live is MERGED — the watermark is a bounded-staleness
    guarantee, not an exactness guarantee; batch 2 here would still accept
    it.)"""
    import time

    d = tmp_path_factory.mktemp("late_stream")
    batches = [
        # b0: two on-time rows in the [00:00, 01:00) window
        [(1, _ts(0, 5), 1, "view", 1.0, None),
         (2, _ts(0, 10), 1, "view", 2.0, None)],
        # b1: advances max event time to 02:00 → watermark (for b2) 01:30
        [(3, _ts(2, 0), 2, "view", 3.0, None)],
        # b2: runs with wm=01:30 > window end → evicts + emits the window
        [(6, _ts(2, 5), 2, "view", 5.0, None)],
        # b3: the LATE row (00:15 < wm) must be dropped, not merged
        [(4, _ts(0, 15), 1, "view", 99.0, None),
         (5, _ts(2, 10), 2, "view", 4.0, None)],
    ]
    for bi, rows in enumerate(batches):
        spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(
            str(d / f"{bi:03d}")
        )
    flat = tmp_path_factory.mktemp("late_flat")
    i = 0
    for sub in sorted(os.listdir(d)):
        for f in sorted(os.listdir(d / sub)):
            if f.endswith(".parquet"):
                os.link(d / sub / f, flat / f"{i:03d}.parquet")
                # stagger mtimes: the file source orders by timestamp
                os.utime(flat / f"{i:03d}.parquet",
                         (time.time() + i * 10, time.time() + i * 10))
                i += 1

    stream = stream_events(spark, str(flat), max_files_per_trigger=1)
    q = (
        windowed_rollup(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("late_rollup")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    q.stop()
    out = spark.table("late_rollup").collect()
    by_window = {(r.window_start.hour, r.event_type): r for r in out}
    # the finalized 00:00 window contains ONLY the two on-time events; the
    # late 99.0-value row was dropped by the watermark, not merged
    r = by_window[(0, "view")]
    assert r.n == 2 and r.total_value == 3.0
    assert dropped == 1


def test_stream_static_broadcast_enrich(spark, stream_dir):
    """Stream-static join: the streaming face of the boundwith lookup
    enrichment (P2) — a static dimension broadcast against an unbounded
    stream, left-outer so unmatched rows pass through.  No watermark is
    needed (static side never changes mid-batch) and the stream is never
    shuffled for the join."""
    from pyspark.sql import functions as F

    stream = stream_events(spark, stream_dir)
    users = spark.createDataFrame(
        [(1, "alice"), (99, "nobody")], "user_id bigint, name string"
    )
    joined = stream.join(F.broadcast(users), "user_id", "left").select(
        "event_id", "user_id", "name"
    )
    out = _run_to_memory(spark, joined, "enriched_stream", "append").collect()
    by_event = {r.event_id: r.name for r in out}
    assert by_event[1] == "alice" and by_event[2] == "alice"
    assert by_event[3] is None  # user 2 has no lookup row → passes through
    assert len(out) == 6  # every stream row survives exactly once


def test_stream_stream_join_with_watermarks(spark, tmp_path_factory):
    """Watermarked stream-stream inner join (the §2.7 surface a
    stream-static join can't cover): clicks join views on user within a
    ±30-minute event-time band; both sides watermark so join state is
    evicted, not unbounded."""
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("ss_join")
    views = [(1, _ts(0, 0), 1, "view", 1.0, None),
             (2, _ts(0, 10), 2, "view", 1.0, None),
             (3, _ts(3, 0), 3, "view", 1.0, None)]
    clicks = [(11, _ts(0, 20), 1, "click", 1.0, None),   # 20m after view 1 → joins
              (12, _ts(1, 30), 2, "click", 1.0, None),   # 80m after view 2 → outside band
              (13, _ts(3, 5), 3, "click", 1.0, None)]    # 5m after view 3 → joins
    vd = tmp_path_factory.mktemp("views_src")
    cd = tmp_path_factory.mktemp("clicks_src")
    spark.createDataFrame(views, DDL).coalesce(1).write.parquet(str(vd / "b"))
    spark.createDataFrame(clicks, DDL).coalesce(1).write.parquet(str(cd / "b"))

    vs = (
        spark.readStream.schema(DDL).parquet(str(vd / "b"))
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "1 hour")
    )
    cs = (
        spark.readStream.schema(DDL).parquet(str(cd / "b"))
        .select(F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
                F.col("event_id").alias("click_id"))
        .withWatermark("c_ts", "1 hour")
    )
    joined = vs.join(
        cs,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    out = _run_to_memory(spark, joined, "ss_join", "append").collect()
    assert {r.click_id for r in out} == {11, 13}  # the 80-minute gap never joins


def test_stream_minhash_neardup_across_batches(spark, tmp_path_factory):
    """Streaming near-dup: a document arriving in micro-batch 2 is caught
    against its near-duplicate from micro-batch 1 (banded-LSH state holds
    signatures only, never text), while unrelated docs emit nothing."""
    import time as _time

    from tulflow_spark.streaming.neardup import stream_minhash_neardup

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the storm rolls across the wide open plain at dusk")
    nearly = base + " tonight"
    other = ("completely different content about spark shuffles and "
             "parquet footers with nothing shared at all in any shingle "
             "of this second unrelated document body text")

    d = tmp_path_factory.mktemp("nd_src")
    spark.createDataFrame(
        [(1, base), (2, other)], "doc_id bigint, text string"
    ).coalesce(1).write.parquet(str(d / "b0"))
    spark.createDataFrame(
        [(3, nearly)], "doc_id bigint, text string"
    ).coalesce(1).write.parquet(str(d / "b1"))
    flat = tmp_path_factory.mktemp("nd_flat")
    i = 0
    for sub in sorted(os.listdir(d)):
        for f in sorted(os.listdir(d / sub)):
            if f.endswith(".parquet"):
                os.link(d / sub / f, flat / f"{i:03d}.parquet")
                os.utime(flat / f"{i:03d}.parquet",
                         (_time.time() + i * 10, _time.time() + i * 10))
                i += 1

    stream = spark.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(flat))
    out = _run_to_memory(
        spark,
        stream_minhash_neardup(stream, threshold=0.5),
        "nd_pairs",
        "append",
    ).collect()
    pairs = {(r.doc_id, r.dup_of) for r in out}
    assert (3, 1) in pairs  # batch-2 doc caught against batch-1 state
    assert all(2 not in p for p in pairs)  # unrelated doc never pairs
    est = max(r.est_jaccard for r in out if (r.doc_id, r.dup_of) == (3, 1))
    assert est >= 0.5


def test_stream_minhash_neardup_bounded_state(spark, tmp_path_factory):
    """max_bucket caps per-bucket state oldest-first: with a cap of 1, an
    identical doc arriving two batches later only pairs against the most
    recent stored copy (recall traded for bounded state — the streaming
    face of the batch max_bucket contract)."""
    import time as _time

    from tulflow_spark.streaming.neardup import stream_minhash_neardup

    text = ("same exact words repeated in every copy of this document "
            "for the minhash signatures to match perfectly across batches")
    d = tmp_path_factory.mktemp("ndb_src")
    for bi, doc_id in enumerate([10, 11, 12]):
        spark.createDataFrame(
            [(doc_id, text)], "doc_id bigint, text string"
        ).coalesce(1).write.parquet(str(d / f"b{bi}"))
    flat = tmp_path_factory.mktemp("ndb_flat")
    i = 0
    for sub in sorted(os.listdir(d)):
        for f in sorted(os.listdir(d / sub)):
            if f.endswith(".parquet"):
                os.link(d / sub / f, flat / f"{i:03d}.parquet")
                os.utime(flat / f"{i:03d}.parquet",
                         (_time.time() + i * 10, _time.time() + i * 10))
                i += 1
    stream = spark.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(flat))
    out = _run_to_memory(
        spark,
        stream_minhash_neardup(stream, threshold=0.9, max_bucket=1),
        "ndb_pairs",
        "append",
    ).collect()
    pairs = {(r.doc_id, r.dup_of) for r in out}
    assert (11, 10) in pairs
    assert (12, 11) in pairs
    assert (12, 10) not in pairs  # doc 10 evicted by the cap before batch 3


def test_stream_minhash_neardup_state_ttl_evicts_idle_buckets(spark):
    """state_ttl_minutes: the update function must (a) re-arm the idle
    clock on every touched batch and (b) drop the whole bucket when Spark
    reports the timeout fired — exercised directly against the factory
    with a minimal GroupState double (the live wall-clock machinery is
    engine-provided; ProcessingTimeTimeout makes a query self-triggering,
    so processAllAvailable cannot settle in a test)."""
    import pandas as pd

    from tulflow_spark.streaming.neardup import _update_factory

    class FakeState:
        def __init__(self, stored=None, timed_out=False):
            self._stored = stored
            self.hasTimedOut = timed_out
            self.removed = False
            self.timeout_ms = None

        @property
        def exists(self):
            return self._stored is not None

        @property
        def get(self):
            return self._stored

        def update(self, v):
            self._stored = v

        def remove(self):
            self.removed = True
            self._stored = None

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    update = _update_factory(threshold=0.5, max_bucket=10, ttl_ms=90_000)
    sig = list(range(32))

    # (a) a data batch stores signatures AND arms the 90 s idle clock
    st = FakeState()
    batch = pd.DataFrame({"doc_id": [1], "_sig": [sig]})
    out = pd.concat(list(update(("k",), iter([batch]), st)))
    assert st.exists and st.timeout_ms == 90_000 and out.empty

    # a near-dup arriving later against the stored state pairs
    st2 = FakeState(stored=([1], [sig]))
    batch2 = pd.DataFrame({"doc_id": [2], "_sig": [sig]})
    out2 = pd.concat(list(update(("k",), iter([batch2]), st2)))
    assert list(out2["dup_of"]) == [1] and st2.timeout_ms == 90_000

    # (b) the timeout invocation drops the bucket wholesale, emits nothing
    st3 = FakeState(stored=([1], [sig]), timed_out=True)
    out3 = pd.concat(list(update(("k",), iter([]), st3)))
    assert st3.removed and out3.empty

    # without a TTL the factory never arms a timeout (NoTimeout path)
    upd_no_ttl = _update_factory(threshold=0.5, max_bucket=10)
    st4 = FakeState()
    pd.concat(list(upd_no_ttl(("k",), iter([batch]), st4)))
    assert st4.timeout_ms is None


def test_stream_minhash_neardup_ttl_query_runs_live(
    spark, tmp_path_factory
):
    """A TTL-enabled query must be accepted by the real engine
    (ProcessingTimeTimeout wiring) and process data: start it, wait for
    the first batch to land, stop it.  Neither processAllAvailable nor
    Trigger.AvailableNow can be used to settle such a query — pending
    processing-time timeouts keep it scheduling batches (verified here
    first); the eviction semantics are pinned by the factory test."""
    import time as _time

    from tulflow_spark.streaming.neardup import stream_minhash_neardup

    src = tmp_path_factory.mktemp("ttl_live")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(
        "doc_id bigint, text string"
    ).parquet(str(src))
    q = (
        stream_minhash_neardup(stream, state_ttl_minutes=5.0)
        .writeStream.format("memory")
        .queryName("ttl_live_pairs")
        .outputMode("append")
        .start()
    )
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            p = q.lastProgress
            if p and p.get("numInputRows", 0) >= 1:
                break
            _time.sleep(0.5)
        else:
            raise AssertionError("TTL query never processed the batch")
        assert q.exception() is None
    finally:
        q.stop()
    assert spark.table("ttl_live_pairs").count() == 0  # one doc: no pairs


def test_stream_scd2_closed_versions_match_batch(spark, tmp_path_factory):
    """Streaming SCD2 across micro-batches must emit exactly the CLOSED
    versions the batch operator derives from the same change log —
    including a cross-batch no-op coalesce, a delete closing without
    opening, and a re-insert after delete."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from tulflow_spark.operators.cdc import scd2_history
    from tulflow_spark.streaming.scd2 import stream_scd2

    b0 = [("A", 1, "x", "I"), ("B", 2, "q", "I"), ("A", 3, "y", "U")]
    b1 = [("A", 4, "y", "U"),   # cross-batch no-op: same payload as open
          ("A", 5, "z", "U"),   # real change: closes y
          ("B", 6, "q", "D")]   # delete: closes q, opens nothing
    b2 = [("B", 7, "r", "I")]   # re-insert after delete

    d = tmp_path_factory.mktemp("scd2_src")
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(
            rows, "k string, seq long, v string, op string"
        ).coalesce(1).write.parquet(str(d / f"b{i}"))
    flat = tmp_path_factory.mktemp("scd2_flat")
    i = 0
    for sub in sorted(_os.listdir(d)):
        for f in sorted(_os.listdir(d / sub)):
            if f.endswith(".parquet"):
                _os.link(d / sub / f, flat / f"{i:03d}.parquet")
                _os.utime(flat / f"{i:03d}.parquet",
                          (_time.time() + i * 10, _time.time() + i * 10))
                i += 1

    stream = spark.readStream.schema(
        "k string, seq long, v string, op string"
    ).option("maxFilesPerTrigger", 1).parquet(str(flat))
    got = _run_to_memory(
        spark,
        stream_scd2(stream, ["k"], "seq", ["v"], op_col="op"),
        "scd2_closed",
        "append",
    ).collect()
    closed = {(r.k, r.v, r.valid_from, r.valid_to) for r in got}

    log = spark.createDataFrame(
        b0 + b1 + b2, "k string, seq long, v string, op string"
    )
    batch_closed = {
        (r.k, r.v, r.valid_from, r.valid_to)
        for r in scd2_history(log, ["k"], ["seq"], ["v"], op_col="op")
        .filter(F.col("valid_to").isNotNull())
        .collect()
    }
    assert closed == batch_closed
    # the still-open versions (A@5 'z', B@7 'r') live in state, not output
    assert all(vt is not None for (_, _, _, vt) in closed)
    assert ("A", "x", 1, 3) in closed and ("A", "y", 3, 5) in closed
    assert ("B", "q", 2, 6) in closed


def test_stream_score_sample_bottom_k_invariant(spark, tmp_path_factory):
    """The streaming sample must equal the k-smallest-hash set a BATCH
    pass over the same data derives — regardless of how the stream was
    micro-batched (the exchangeability property the thresholds rest on);
    state is bounded at shards x per_shard."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from tulflow_spark.streaming.quality import (
        stream_score_sample,
        thresholds_from_sample,
    )

    rows = [(i, float((i * 37) % 101)) for i in range(600)]
    d = tmp_path_factory.mktemp("qs_src")
    for b in range(3):
        spark.createDataFrame(
            rows[b * 200 : (b + 1) * 200], "doc_id long, score double"
        ).coalesce(1).write.parquet(str(d / f"b{b}"))
    flat = tmp_path_factory.mktemp("qs_flat")
    i = 0
    for sub in sorted(_os.listdir(d)):
        for f in sorted(_os.listdir(d / sub)):
            if f.endswith(".parquet"):
                _os.link(d / sub / f, flat / f"{i:03d}.parquet")
                _os.utime(flat / f"{i:03d}.parquet",
                          (_time.time() + i * 10, _time.time() + i * 10))
                i += 1

    stream = spark.readStream.schema("doc_id long, score double").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(flat))
    out = _run_to_memory(
        spark,
        stream_score_sample(stream, "doc_id", "score",
                            shards=4, per_shard=16),
        "qsample",
        "update",
    )
    # latest emission per (shard, ok) is the live sample; earlier update
    # rows for the same shard are superseded — reconstruct per shard from
    # the final emission set: collect all rows, keep per shard the 16
    # smallest oks among the LAST batch's rows for that shard.  Memory
    # sink appends update rows, so recompute the expected set instead.
    batch = spark.createDataFrame(rows, "doc_id long, score double")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":qsample")))
    from pyspark.sql import Window

    expected = (
        batch.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int").alias("shard"),
            F.col("score"),
            F.substring(key, 1, 16).alias("ok"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("shard").orderBy("ok")
            ),
        )
        .filter(F.col("rk") <= 16)
        .select("shard", "score", "ok")
    )
    exp = {(r.shard, r.ok, r.score) for r in expected.collect()}
    # the streaming emissions contain every expected sample row (the
    # final state), and nothing with a smaller key than the expected max
    got = {(r.shard, r.ok, r.score) for r in out.collect()}
    assert exp <= got
    # per-shard: the BEST 16 keys ever emitted == the expected set
    best = {}
    for shard, ok, score in got:
        best.setdefault(shard, []).append((ok, score))
    final = {
        (shard, ok, score)
        for shard, pairs in best.items()
        for ok, score in sorted(pairs)[:16]
    }
    assert final == exp

    # thresholds over the sample are computable and ordered
    sample_df = spark.createDataFrame(
        [(s, sc, ok) for (s, ok, sc) in exp], "shard int, score double, ok string"
    )
    t = thresholds_from_sample(sample_df, [0.25, 0.5, 0.75])
    assert t[0] <= t[1] <= t[2]
    # scores are (i*37)%101 = near-uniform over 0..100; the deterministic
    # 64-point sample's median must sit near the true median (sampling
    # error bound, no flake risk: the md5 sample is a fixed set)
    assert 25 <= t[1] <= 75


def test_stream_temperature_stats_match_batch(spark, tmp_path_factory):
    """Streaming per-domain counters after the last micro-batch must equal
    a batch groupBy over the same data, and the rates derived from them
    must be bit-identical to the batch temperature_rates — the contract
    that lets a streaming mixer hand off to (or backfill from) the batch
    recipe."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from tulflow_spark.ext.mixing import rates_from_stats, temperature_rates
    from tulflow_spark.streaming.temperature import (
        latest_stats,
        stream_domain_stats,
    )

    rows = [
        (i, ["web", "code", "books"][i % 3], 50 + (i * 13) % 200)
        for i in range(600)
    ]
    schema = "doc_id long, domain string, n_tokens long"
    d = tmp_path_factory.mktemp("tm_src")
    for b in range(3):
        spark.createDataFrame(
            rows[b * 200 : (b + 1) * 200], schema
        ).coalesce(1).write.parquet(str(d / f"b{b}"))
    flat = tmp_path_factory.mktemp("tm_flat")
    i = 0
    for sub in sorted(_os.listdir(d)):
        for f in sorted(_os.listdir(d / sub)):
            if f.endswith(".parquet"):
                _os.link(d / sub / f, flat / f"{i:03d}.parquet")
                _os.utime(flat / f"{i:03d}.parquet",
                          (_time.time() + i * 10, _time.time() + i * 10))
                i += 1

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(flat))
    out = _run_to_memory(
        spark,
        stream_domain_stats(stream, "domain", "n_tokens"),
        "tmix_stats",
        "update",
    )
    # the memory sink accumulates update rows across batches; latest_stats
    # reduces them to the final counters (monotone-max contract)
    live = latest_stats(out)
    batch = spark.createDataFrame(rows, schema)
    expected = batch.groupBy("domain").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("n_tokens").cast("long")).alias("_tok"),
    )
    got = {(r.domain, r._n, r._tok) for r in live.collect()}
    exp = {(r.domain, r._n, r._tok) for r in expected.collect()}
    assert got == exp
    # each domain emitted once per micro-batch it appeared in (3 batches,
    # every domain in every batch) — intermediate emissions are the
    # running prefix totals
    assert out.count() == 9
    # rates from the streaming counters == batch temperature_rates
    r_stream = rates_from_stats(live, "domain", budget_tokens=30_000.0)
    r_batch = temperature_rates(
        batch, "domain", "n_tokens", budget_tokens=30_000.0
    )
    assert r_stream == r_batch
    assert set(r_stream) == {"web", "code", "books"}
    assert all(0.0 < v <= 1.0 for v in r_stream.values())


def test_stream_scd2_op_transition_same_payload_two_versions(spark,
                                                             tmp_path_factory):
    """The no-op signature is payload AND op (batch parity): an I->U
    transition with identical payload must stay TWO versions, while
    U->U with identical payload coalesces."""
    from pyspark.sql import functions as F

    from tulflow_spark.operators.cdc import scd2_history
    from tulflow_spark.streaming.scd2 import stream_scd2

    rows = [("C", 1, "v", "I"), ("C", 2, "v", "U"),  # same payload, I->U
            ("C", 3, "v", "U"),                       # U->U: coalesced
            ("C", 4, "w", "U")]
    schema = "k string, seq long, v string, op string"
    d = tmp_path_factory.mktemp("scd2_op")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(d / "b0")
    )
    stream = spark.readStream.schema(schema).parquet(str(d / "b0"))
    got = {
        (r.k, r.v, r.valid_from, r.valid_to)
        for r in _run_to_memory(
            spark,
            stream_scd2(stream, ["k"], "seq", ["v"], op_col="op"),
            "scd2_op_tbl",
            "append",
        ).collect()
    }
    log = spark.createDataFrame(rows, schema)
    batch = {
        (r.k, r.v, r.valid_from, r.valid_to)
        for r in scd2_history(log, ["k"], ["seq"], ["v"], op_col="op")
        .filter(F.col("valid_to").isNotNull())
        .collect()
    }
    assert got == batch
    assert ("C", "v", 1, 2) in got and ("C", "v", 2, 4) in got


def test_stream_scd2_cross_chunk_sequence_order(spark, tmp_path_factory):
    """A key's rows arriving as MULTIPLE Arrow chunks (forced via a tiny
    maxRecordsPerBatch) must still apply in sequence order — the sort
    happens once over the gathered batch, not per chunk."""
    from pyspark.sql import functions as F

    from tulflow_spark.operators.cdc import scd2_history
    from tulflow_spark.streaming.scd2 import stream_scd2

    # out-of-order within the batch so a chunk-local sort would misorder
    rows = [("K", 5, "e", "U"), ("K", 1, "a", "I"), ("K", 4, "d", "U"),
            ("K", 2, "b", "U"), ("K", 6, "f", "U"), ("K", 3, "c", "U")]
    schema = "k string, seq long, v string, op string"
    d = tmp_path_factory.mktemp("scd2_chunks")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(d / "b0")
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(schema).parquet(str(d / "b0"))
        got = {
            (r.k, r.v, r.valid_from, r.valid_to)
            for r in _run_to_memory(
                spark,
                stream_scd2(stream, ["k"], "seq", ["v"], op_col="op"),
                "scd2_chunk_tbl",
                "append",
            ).collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    batch = {
        (r.k, r.v, r.valid_from, r.valid_to)
        for r in scd2_history(
            spark.createDataFrame(rows, schema), ["k"], ["seq"], ["v"],
            op_col="op",
        ).filter(F.col("valid_to").isNotNull()).collect()
    }
    assert got == batch
    assert ("K", "a", 1, 2) in got and ("K", "e", 5, 6) in got


def test_stream_scd2_null_payload_coalesces(spark, tmp_path_factory):
    """NULL payload values must compare null-safely (batch eqNullSafe
    parity): two consecutive NULL-payload updates coalesce instead of
    churning a spurious version."""
    from pyspark.sql import functions as F

    from tulflow_spark.operators.cdc import scd2_history
    from tulflow_spark.streaming.scd2 import stream_scd2

    rows = [("N", 1, None, "U"), ("N", 2, None, "U"), ("N", 3, 5.0, "U")]
    schema = "k string, seq long, v double, op string"
    d = tmp_path_factory.mktemp("scd2_null")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(d / "b0")
    )
    stream = spark.readStream.schema(schema).parquet(str(d / "b0"))
    got = {
        (r.k, r.v, r.valid_from, r.valid_to)
        for r in _run_to_memory(
            spark,
            stream_scd2(stream, ["k"], "seq", ["v"], op_col="op"),
            "scd2_null_tbl",
            "append",
        ).collect()
    }
    batch = {
        (r.k, r.v, r.valid_from, r.valid_to)
        for r in scd2_history(
            spark.createDataFrame(rows, schema), ["k"], ["seq"], ["v"],
            op_col="op",
        ).filter(F.col("valid_to").isNotNull()).collect()
    }
    assert got == batch == {("N", None, 1, 3)}
