"""ext/textfix.py: mojibake detection and repair (the ftfy-class
encoding-cleanup stage)."""

from __future__ import annotations

import pytest

from tulflow_spark.ext.textfix import fix_mojibake, mojibake_score


@pytest.mark.parametrize(
    "clean",
    [
        "héllo wörld — “smart” quotes and №42",
        "naïve façade über Zürich",
        "русский текст and 中文混排",
        "emoji 🎉 and combining é",
    ],
)
def test_latin1_flavor_roundtrip(clean):
    mangled = clean.encode("utf-8").decode("latin-1")
    assert mojibake_score(mangled) > 0
    assert fix_mojibake(mangled) == clean


def test_cp1252_flavor_roundtrip():
    clean = "héllo wörld café"
    mangled = clean.encode("utf-8").decode("cp1252")
    assert fix_mojibake(mangled) == clean


def test_double_mangled_needs_two_passes():
    clean = "déjà vu"
    once = clean.encode("utf-8").decode("latin-1")
    twice = once.encode("utf-8").decode("latin-1")
    assert fix_mojibake(twice) == clean
    assert fix_mojibake(twice, max_passes=1) == once


def test_clean_text_is_a_fixed_point():
    for s in ("plain ascii", "héllo wörld", "À suivre", "", "Ã alone",
              "price €10 — fine"):
        assert fix_mojibake(s) == s, s
    assert mojibake_score("plain") == 0
    assert mojibake_score("") == 0
    assert fix_mojibake("") == ""


def test_known_tradeoff_literal_signature_is_repaired():
    # a document ABOUT encodings consisting of literal bigrams is
    # indistinguishable from mojibake — documented ftfy trade-off
    assert fix_mojibake("Ã© Ã¨") == "é è"
    assert mojibake_score("Ã© Ã¨") == 2
    # but MIXED text (a literal bigram next to a standalone accent) is
    # left alone: the standalone é makes the reverse bytes invalid
    # UTF-8, and the validity gate applies to the whole string
    assert fix_mojibake("the bytes Ã© mean é") == "the bytes Ã© mean é"


def test_invalid_reverse_transform_left_alone():
    # signature fires but the latin-1 bytes are NOT valid UTF-8:
    # lead byte with a non-continuation follow-up after re-encode
    s = "ÃÀx"  # C3 C0 78 — C0 is not a valid continuation
    assert fix_mojibake(s) == s


def test_spark_udfs(spark):
    from pyspark.sql import functions as F

    from tulflow_spark.ext.textfix import (
        fix_mojibake_udf,
        mojibake_score_udf,
    )

    clean = ["héllo wörld", "plain", None, "déjà vu — ok"]
    rows = [(i, (c.encode("utf-8").decode("latin-1") if c else None))
            for i, c in enumerate(clean)]
    df = spark.createDataFrame(rows, "i int, t string")
    out = (df.withColumn("fixed", fix_mojibake_udf("t"))
             .withColumn("score", mojibake_score_udf("t"))
             .orderBy("i").collect())
    assert [r["fixed"] for r in out] == clean
    assert out[1]["score"] == 0 and out[2]["score"] is None
    assert out[0]["score"] > 0
