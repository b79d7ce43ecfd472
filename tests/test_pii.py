"""PII scrubbing + repetition filters on realistic strings (the gate
queries tx6/tx7 exercise the same functions against DuckDB oracles on the
driver corpus; these pin behavior the synthetic tables can't show)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tulflow_spark.ext.text import (
    mask_digits,
    pseudonymize,
    redact_pii,
    repetition_profile,
)


def test_redact_pii_kinds(spark):
    df = spark.createDataFrame(
        [
            ("mail me at jane.doe+test@example.co.uk today",),
            ("ssn 123-45-6789 on file",),
            ("server 10.0.255.3 responded",),
            ("call +1 (555) 123-4567 now",),
            ("no pii here at all",),
        ],
        "text STRING",
    )
    out = [r[0] for r in df.select(redact_pii("text")).collect()]
    assert out[0] == "mail me at [EMAIL] today"
    assert out[1] == "ssn [SSN] on file"
    assert out[2] == "server [IPV4] responded"
    assert "[PHONE]" in out[3] and "4567" not in out[3]
    assert out[4] == "no pii here at all"


def test_phone_pattern_precision(spark):
    """The phone pattern requires phone STRUCTURE (r3 VERDICT: the old
    9+-digit-run pattern matched ISBNs and year ranges)."""
    positives = [
        "+1 (555) 123-4567",
        "+44 20 7946 0958",
        "+12025550173",
        "(215) 555-0100",
        "215-555-0100",
        "215.555.0100",
        "215 555 0100",
    ]
    negatives = [
        "ISBN 978-0-306-40615-7",        # ISBN-13
        "ISBN 0-306-40615-2",            # ISBN-10
        "the 1990-1995 cohort",          # year range
        "rows 1234-5678 were dropped",   # numeric range
        "pi is 3.14159 and e is 2.71828",
        "total 1,234,567.89 USD",
        "released 2024-01-15",           # ISO date
        "order 123456789012",            # bare digit run, no separators
    ]
    df = spark.createDataFrame([(t,) for t in positives + negatives],
                               "text STRING")
    out = [r[0] for r in df.select(redact_pii("text")).collect()]
    for src, red in zip(positives, out[: len(positives)]):
        assert "[PHONE]" in red, f"missed phone: {src!r} -> {red!r}"
    for src, red in zip(negatives, out[len(positives):]):
        assert "[PHONE]" not in red, f"false positive: {src!r} -> {red!r}"


def test_redaction_is_idempotent(spark):
    df = spark.createDataFrame([("a@b.com and 123-45-6789",)], "text STRING")
    once = df.select(redact_pii("text").alias("t"))
    twice = once.select(redact_pii("t").alias("t"))
    assert once.collect() == twice.collect()


def test_mask_and_pseudonymize(spark):
    df = spark.createDataFrame(
        [("Customer#000000042",), ("Customer#000000042",), ("other",)],
        "name STRING",
    )
    rows = df.select(
        mask_digits("name").alias("m"), pseudonymize("name").alias("p")
    ).collect()
    assert rows[0]["m"] == "Customer#XXXXXXXXX"
    # deterministic: same input -> same pseudonym; different input differs
    assert rows[0]["p"] == rows[1]["p"] != rows[2]["p"]
    # salting changes the mapping (prevents cross-dataset linkage)
    salted = df.select(pseudonymize("name", salt="s1").alias("p")).collect()
    assert salted[0]["p"] != rows[0]["p"]


def test_repetition_profile_flags_repetitive_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),
            (2, "a perfectly ordinary sentence with no repeats"),
            (3, "one two one two one two one two"),
            (4, "   "),  # empty after trim: excluded
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in
            repetition_profile(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["top_token_ppm"] == 1_000_000 and not rows[1]["keep"]
    assert rows[2]["dup_token_ppm"] == 0 and rows[2]["keep"]
    # "one two ..." x4: 8 tokens, 7 bigrams, 2 distinct -> dup 5/7
    assert rows[3]["dup_bigram_ppm"] == 1_000_000 * 5 // 7
    assert not rows[3]["keep"]
