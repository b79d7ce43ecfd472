"""ext.text late additions: zlib compression-ratio signal."""

from __future__ import annotations

from tulflow_spark.ext.text import compression_ratio


def test_compression_ratio_orders_repetitive_below_random(spark):
    import random

    rng = random.Random(7)
    repetitive = "spam and eggs " * 100
    # letters-only high-entropy text of comparable length
    noisy = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(1400))
    df = spark.createDataFrame(
        [(1, repetitive), (2, noisy), (3, ""), (4, None)],
        "id long, text string",
    )
    got = {r["id"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}
    assert got[1] < 0.1  # templated text crushes
    assert got[2] > 0.5  # entropy resists
    assert got[1] < got[2]
    assert got[3] is None and got[4] is None


def test_compression_ratio_deterministic(spark, sf_dir):
    from tulflow_spark.io import table

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    a = {r["doc_id"]: r["zlib_ratio"] for r in compression_ratio(d).collect()}
    b = {
        r["doc_id"]: r["zlib_ratio"]
        for r in compression_ratio(d.repartition(5)).collect()
    }
    assert a == b
