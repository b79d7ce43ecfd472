"""streaming/cardinality.py: running KMV distinct-count sketches.

The equivalence claim is EXACT (not approximate): the streaming sketch
over N micro-batches equals the batch ext/theta.py sketch over the
concatenated input, because KMV is a pure function of the hash set."""

from __future__ import annotations

import pytest


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


def _mk_stream(spark, tmp_path_factory, rows, n_files):
    src = str(tmp_path_factory.mktemp("kmv_src"))
    per = max(1, len(rows) // n_files)
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per] if i < n_files - 1 \
            else rows[(n_files - 1) * per :]
        spark.createDataFrame(chunk, "g string, v string") \
            .coalesce(1).write.parquet(f"{src}/b{i}")
    return (
        spark.readStream.schema("g string, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )


def test_streaming_matches_batch_exactly(spark, tmp_path_factory):
    from tulflow_spark.ext.theta import kmv_estimate, kmv_sketch
    from tulflow_spark.streaming.cardinality import streaming_cardinality

    k = 32
    rows = [("a", f"v{i % 100}") for i in range(300)] + \
           [("b", f"w{i}") for i in range(20)]
    stream = _mk_stream(spark, tmp_path_factory, rows, n_files=3)
    tbl = _run_to_memory(
        spark, streaming_cardinality(stream, "g", "v", k=k),
        "kmv_stream_tbl", "update",
    )
    latest = {}
    for r in tbl.collect():
        latest[r.group] = r  # update mode: later rows overwrite
    batch = spark.createDataFrame(rows, "g string, v string")
    want = {
        r["g"]: r
        for r in kmv_estimate(kmv_sketch(batch, "g", "v", k=k),
                              "g", k=k).collect()
    }
    for g in ("a", "b"):
        assert latest[g].estimate == want[g]["estimate"], g
        assert latest[g].kept == min(int(want[g]["kept"]), k), g
    assert latest["b"].estimate == 20  # below k: exact


def test_state_bounded_at_k(spark, tmp_path_factory):
    from tulflow_spark.streaming.cardinality import streaming_cardinality

    k = 8
    rows = [("g", f"u{i}") for i in range(500)]
    stream = _mk_stream(spark, tmp_path_factory, rows, n_files=4)
    tbl = _run_to_memory(
        spark, streaming_cardinality(stream, "g", "v", k=k),
        "kmv_cap_tbl", "update",
    )
    rows_out = tbl.collect()
    assert all(r.kept <= k for r in rows_out)  # state bounded at k
    # the FINAL emission equals the (deterministic) batch estimate —
    # k=8 is deliberately tiny, so compare exactly, not by tolerance
    from tulflow_spark.ext.theta import kmv_estimate, kmv_sketch

    batch = spark.createDataFrame(rows, "g string, v string")
    want = kmv_estimate(kmv_sketch(batch, "g", "v", k=k),
                        "g", k=k).collect()[0]["estimate"]
    assert rows_out[-1].estimate == want


def test_update_factory_chunked_delivery_and_nulls(spark):
    """applyInPandasWithState delivers a key's rows as MULTIPLE chunks
    in no guaranteed order — fold must be chunk- and order-insensitive;
    NULL values are excluded."""
    import pandas as pd

    from tulflow_spark.streaming.cardinality import _update_factory

    class FakeState:
        exists = False

        def __init__(self):
            self.value = None

        def update(self, v):
            self.value = v
            self.exists = True

        @property
        def get(self):
            return self.value

    update = _update_factory(4)
    st = FakeState()
    chunks = [pd.DataFrame({"_value": ["b", None]}),
              pd.DataFrame({"_value": ["a", "c", "a"]})]
    out = list(update(("g",), iter(chunks), st))
    assert out[0]["estimate"].iloc[0] == 3  # a, b, c — NULL excluded
    # a second batch with the same values changes nothing
    out2 = list(update(("g",), iter([chunks[1]]), st))
    assert out2[0]["estimate"].iloc[0] == 3


def test_k_wall(spark):
    from tulflow_spark.streaming.cardinality import streaming_cardinality

    with pytest.raises(ValueError, match="k >= 2"):
        streaming_cardinality(
            spark.readStream.format("rate").load(), "value", "value", k=1
        )


def test_null_group_and_all_null_values_match_batch_semantics():
    """Review r9: a NULL group stays NULL (not the string 'None'), and
    an all-NULL-value group emits nothing — exactly the batch sketch."""
    import pandas as pd

    from tulflow_spark.streaming.cardinality import _update_factory

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v
            self.exists = True

        @property
        def get(self):
            return self.value

    update = _update_factory(4)
    out = list(update((None,), iter([pd.DataFrame({"_value": ["x"]})]),
                      FakeState()))
    assert out[0]["group"].iloc[0] is None
    st = FakeState()
    out2 = list(update(("g",), iter([pd.DataFrame({"_value": [None]})]),
                       st))
    assert out2 == [] and not st.exists  # phantom zero suppressed
