"""ext.nb: self-trained Naive-Bayes classifier."""

from __future__ import annotations

from pyspark.sql import functions as F

from tulflow_spark.ext.nb import nb_log_scores, nb_scores


def _corpus(spark):
    en = ["the cat sat on the mat", "the dog and the cat", "a cat is a pet"]
    fr = ["le chat et le chien", "le chien est un animal", "un chat est la"]
    rows = [(i, t, "en") for i, t in enumerate(en)] + [
        (10 + i, t, "fr") for i, t in enumerate(fr)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_both_scorers_perfect_on_separable_corpus(spark):
    df = _corpus(spark)
    pos = F.col("lang") == "en"
    for fn in (nb_scores, nb_log_scores):
        got = {r["doc_id"]: r["pred"] for r in fn(df, "doc_id", "text", pos).collect()}
        assert got == {0: True, 1: True, 2: True, 10: False, 11: False, 12: False}, fn


def test_log_scorer_finite_on_single_class_corpus(spark):
    # r4 ADVICE: an all-one-class corpus used to make log(prior)=log(0)
    # NULL out every score; Laplace-smoothed priors keep them finite
    rows = [(i, t) for i, t in enumerate(["the cat sat", "a dog ran", "the end"])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = nb_log_scores(df, "doc_id", "text", F.lit(True)).collect()
    assert len(got) == 3
    for r in got:
        assert r["log_pos"] is not None and r["log_neg"] is not None
        assert r["pred"] is True  # all-positive corpus → positive wins


def test_additive_and_log_scorers_mostly_agree(spark, sf_dir):
    from tulflow_spark.io import table

    d = table(spark, sf_dir, "documents")
    pos = F.col("lang") == "en"
    a = nb_scores(d, "doc_id", "text", pos).select("doc_id", F.col("pred").alias("pa"))
    b = nb_log_scores(d, "doc_id", "text", pos).select(
        "doc_id", F.col("pred").alias("pb")
    )
    j = a.join(b, "doc_id")
    tot = j.count()
    agree = j.filter(F.col("pa") == F.col("pb")).count()
    # different decision rules (additive vs log-product) — measured 0.87
    assert agree / tot >= 0.8, f"agreement {agree / tot}"


def test_scores_deterministic_under_repartition(spark, sf_dir):
    from tulflow_spark.io import table

    d = table(spark, sf_dir, "documents")
    pos = F.col("lang") == "en"
    a = {
        r["doc_id"]: (r["s_pos"], r["s_neg"])
        for r in nb_scores(d, "doc_id", "text", pos).collect()
    }
    b = {
        r["doc_id"]: (r["s_pos"], r["s_neg"])
        for r in nb_scores(d.repartition(7), "doc_id", "text", pos).collect()
    }
    assert a == b  # exact equality — scaled-integer arithmetic


def test_model_join_is_broadcast(spark, sf_dir):
    from tulflow_spark.io import table

    d = table(spark, sf_dir, "documents")
    plan = (
        nb_scores(d, "doc_id", "text", F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
