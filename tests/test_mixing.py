"""ext.mixing: the bucketed grouped prefix sum must be bit-identical to a
naive global window, and the sampling/packing semantics built on it."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from tulflow_spark.ext.mixing import (
    domain_token_sample,
    grouped_prefix_sum,
    order_key,
    pack_sequences,
)


def _rand_docs(seed: int, n: int, n_domains: int):
    rng = random.Random(seed)
    return [
        (
            i,
            rng.choice([f"d{j}" for j in range(n_domains)]),
            " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(1, 30))),
        )
        for i in range(n)
    ]


def test_grouped_prefix_sum_matches_naive_window(spark):
    df = spark.createDataFrame(
        _rand_docs(7, 300, 5), ["doc_id", "source", "text"]
    ).withColumn("v", F.size(F.split(F.trim("text"), r"\s+")).cast("long"))

    got = grouped_prefix_sum(
        df, ["source"], order_key("doc_id"), "doc_id", F.col("v"), "cum"
    ).select("doc_id", "cum")

    naive = df.withColumn("_ok", order_key("doc_id")).withColumn(
        "cum",
        F.sum("v").over(
            Window.partitionBy("source").orderBy("_ok", "doc_id")
        ),
    ).select("doc_id", "cum")

    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_grouped_prefix_sum_global(spark):
    df = spark.createDataFrame(
        [(i, 10) for i in range(200)], ["doc_id", "v"]
    )
    got = grouped_prefix_sum(
        df, [], order_key("doc_id"), "doc_id", F.col("v"), "cum"
    )
    cums = sorted(r["cum"] for r in got.collect())
    # constant values: the inclusive running totals are exactly 10,20,...,2000
    assert cums == [10 * (i + 1) for i in range(200)]


def test_domain_token_sample_inclusive_boundary(spark):
    # Every doc has 10 tokens; budget 35 keeps exactly 3 docs per domain
    # (inclusive totals 10,20,30 fit; 40 does not).
    docs = [
        (i, f"d{i % 2}", " ".join(["tok"] * 10)) for i in range(20)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    kept = domain_token_sample(
        df, "doc_id", "text", "source", budgets={}, default_budget=35
    ).collect()
    by_dom: dict[str, int] = {}
    for r in kept:
        by_dom[r["source"]] = by_dom.get(r["source"], 0) + 1
        assert r["cum_tokens"] <= 35
    assert by_dom == {"d0": 3, "d1": 3}


def test_domain_token_sample_unbudgeted_kept_whole(spark):
    df = spark.createDataFrame(
        [(i, "dx", "a b c") for i in range(9)], ["doc_id", "source", "text"]
    )
    kept = domain_token_sample(
        df, "doc_id", "text", "source", budgets={"other": 1}
    )
    assert kept.count() == 9


def test_pack_sequences_invariants(spark):
    df = spark.createDataFrame(
        _rand_docs(11, 250, 1), ["doc_id", "source", "text"]
    )
    out = pack_sequences(df, "doc_id", "text", seq_len=64).collect()
    assert len(out) == 250
    # reconstruct the stream: sort docs by (md5 order); starts must be the
    # exclusive prefix sums and offsets consistent with seq ids
    rows = sorted(out, key=lambda r: (r["seq_id"], r["seq_offset"]))
    pos = 0
    for r in rows:
        assert r["seq_id"] * 64 + r["seq_offset"] == pos
        assert 0 <= r["seq_offset"] < 64
        pos += r["n_tokens"]


class TestHashSample:
    def _docs(self, spark, n=400):
        rows = [(i, "src0" if i % 2 else "src1") for i in range(n)]
        return spark.createDataFrame(rows, ["doc_id", "source"])

    def test_deterministic_and_rate_shaped(self, spark):
        from tulflow_spark.ext.mixing import hash_sample

        df = self._docs(spark)
        a = hash_sample(df, "doc_id", "source", {"src0": 0.5, "src1": 1.0})
        b = hash_sample(df, "doc_id", "source", {"src0": 0.5, "src1": 1.0})
        ids_a = sorted(r.doc_id for r in a.collect())
        assert ids_a == sorted(r.doc_id for r in b.collect())
        # rate 1.0 keeps every src1 row
        n_src1 = a.where("source = 'src1'").count()
        assert n_src1 == df.where("source = 'src1'").count()
        # rate 0.5 keeps roughly half of src0 (md5 is uniform)
        n_src0 = a.where("source = 'src0'").count()
        assert 0.3 * 200 < n_src0 < 0.7 * 200

    def test_nested_samples(self, spark):
        from tulflow_spark.ext.mixing import hash_sample

        df = self._docs(spark)
        small = {
            r.doc_id
            for r in hash_sample(
                df, "doc_id", "source", {}, default_rate=0.2
            ).collect()
        }
        big = {
            r.doc_id
            for r in hash_sample(
                df, "doc_id", "source", {}, default_rate=0.6
            ).collect()
        }
        assert small <= big

    def test_rate_zero_and_validation(self, spark):
        import pytest

        from tulflow_spark.ext.mixing import hash_sample

        df = self._docs(spark, 50)
        assert hash_sample(df, "doc_id", "source", {}, default_rate=0.0).count() == 0
        with pytest.raises(ValueError):
            hash_sample(df, "doc_id", "source", {"src0": 1.5})


def test_rarity_terms_hand_computed(spark):
    from tulflow_spark.ext.text import rarity_terms

    # 4 docs; 'rare' appears in exactly one doc (idf 4.0), 'common' in all
    # (idf 1.0).  doc 0: tf(rare)=2 -> score 8.0 tops everything.
    rows = [
        (0, "rare rare common alpha"),
        (1, "common beta beta"),
        (2, "common alpha"),
        (3, "common alpha beta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = rarity_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    top0 = sorted(by_doc[0], key=lambda r: r.rank)
    assert top0[0].term == "rare" and top0[0].score == 8.0
    assert all(len(v) == 2 for v in by_doc.values())
    # deterministic tie-break: doc 2 has alpha (2.0) then common (1.0)
    top2 = sorted(by_doc[2], key=lambda r: r.rank)
    assert [r.term for r in top2] == ["alpha", "common"]


class TestChunkTokens:
    def test_overlap_and_truncation(self, spark):
        from tulflow_spark.ext.mixing import chunk_tokens

        text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = {
            r["chunk_id"]: r
            for r in chunk_tokens(df, "doc_id", "text", max_len=4, stride=3).collect()
        }
        # starts at 0,3,6,9 → 4 windows; last truncated to 1 token
        assert sorted(rows) == [0, 1, 2, 3]
        assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
        assert rows[1]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
        assert rows[3]["chunk_text"] == "t9"
        assert rows[3]["n_chunk_tokens"] == 1

    def test_empty_docs_emit_no_chunks(self, spark):
        # r4 ADVICE: size(_t)=0 used to make sequence(0,-1) DESCENDING,
        # emitting two phantom empty chunks per empty doc — and with
        # stride=1 crashing slice (INVALID_PARAMETER_VALUE.START).  The
        # oracle emits zero rows for empty docs; so must we.
        from tulflow_spark.ext.mixing import chunk_tokens

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "a b c")], "doc_id long, text string"
        )
        for stride in (1, 2, None):
            rows = chunk_tokens(
                df, "doc_id", "text", max_len=2, stride=stride
            ).collect()
            assert {r["doc_id"] for r in rows} == {3}
            assert all(r["n_chunk_tokens"] > 0 for r in rows)

    def test_no_overlap_default_stride(self, spark):
        from tulflow_spark.ext.mixing import chunk_tokens

        text = " ".join(f"t{i}" for i in range(6))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = chunk_tokens(df, "doc_id", "text", max_len=3).collect()
        assert sorted(r["chunk_text"] for r in rows) == ["t0 t1 t2", "t3 t4 t5"]

    def test_chunking_is_map_only(self, spark, sf_dir):
        from tulflow_spark.ext.mixing import chunk_tokens
        from tulflow_spark.io import table

        plan = (
            chunk_tokens(
                table(spark, sf_dir, "documents"), "doc_id", "text", 64, 48
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Join" not in plan


def test_quality_mix_approx_tracks_exact_quartiles(spark, sf_dir):
    """The approx-threshold mixer must produce buckets that agree with the
    exact NTILE quartiles for almost every document (ties at thresholds
    are the only legitimate drift), and its per-bucket picks are exactly
    k."""
    from pyspark.sql import Window

    from tulflow_spark.ext.lm import bigram_score
    from tulflow_spark.ext.mixing import quality_mix_approx
    from tulflow_spark.io import table

    scored = bigram_score(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    ).select(
        "doc_id",
        (F.col("sum_inv_p") / F.col("n_bigrams")).alias("quality"),
    ).cache()
    try:
        picked = quality_mix_approx(scored, per_bucket=10)
        by_bucket = {
            r.bucket: r.n
            for r in picked.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        assert set(by_bucket) == {1, 2, 3, 4}
        assert all(n == 10 for n in by_bucket.values())

        # agreement with exact NTILE on bucket assignment (pre-pick)
        exact = scored.withColumn(
            "ebucket",
            F.ntile(4).over(Window.orderBy("quality", "doc_id")).cast("int"),
        )
        approx_all = quality_mix_approx(scored, per_bucket=10**9)
        joined = approx_all.join(exact, "doc_id").select(
            (F.col("bucket") == F.col("ebucket")).cast("int").alias("same")
        )
        agree = joined.agg(F.avg("same")).head()[0]
        assert agree >= 0.95, agree
    finally:
        scored.unpersist()


def test_hash_split_partitions_and_determinism(spark):
    """hash_split: exhaustive partition (every row exactly one split),
    weight-proportional shares, per-row independence (subset stability),
    salt decorrelation, and input validation."""
    import pytest

    from tulflow_spark.ext.mixing import hash_split

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out = hash_split(df, "doc_id", w)
    counts = {r.split: r.n for r in
              out.groupBy("split").count().withColumnRenamed("count", "n")
              .collect()}
    assert sum(counts.values()) == 5000
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["valid"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02
    # per-row independence: a subset's assignments match the full run's
    sub = hash_split(df.filter(F.col("doc_id") < 100), "doc_id", w)
    full = {r.doc_id: r.split for r in out.filter(F.col("doc_id") < 100).collect()}
    assert {r.doc_id: r.split for r in sub.collect()} == full
    # salt decorrelates
    salted = {r.doc_id: r.split
              for r in hash_split(df, "doc_id", w, salt="v2").collect()}
    base = {r.doc_id: r.split for r in out.collect()}
    assert salted != base
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 1.5, "b": -0.5})


def test_hash_split_zero_weight_trailing_split(spark):
    """A zero-weight trailing split must receive NOTHING: the cumulative
    threshold reaches 1.0 mid-chain and must clamp to the 'g' sentinel,
    not overflow to a 9-hex string that breaks the fixed-width compare."""
    from tulflow_spark.ext.mixing import hash_split

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 1.0, "valid": 0.0})
    counts = {r.split: r.n for r in
              out.groupBy("split").count().withColumnRenamed("count", "n")
              .collect()}
    assert counts == {"train": 1000}
