"""Validation tests: schematron-subset parser + rule compiler + filter/report
operators, mirroring the reference's valid/invalid/mix/empty matrices
(test_validate.py edge cases) with original fixture content."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tulflow_spark.validation import (
    AllRecordsFilteredError,
    Rule,
    filter_with_report,
    parse_schematron,
    report_all,
    violations_column,
)
from tulflow_spark.validation.ops import guard_not_all_filtered
from tulflow_spark.validation.schematron import UnsupportedSchematron

SCH = """<?xml version="1.0"?>
<schema xmlns="http://purl.oclc.org/dsdl/schematron">
  <ns prefix="dcterms" uri="http://purl.org/dc/terms/"/>
  <ns prefix="edm" uri="http://www.europeana.eu/schemas/edm/"/>
  <pattern id="req">
    <rule context="oai_dc:dc">
      <assert test="dcterms:title" id="R1">There must be a title</assert>
      <assert test="dcterms:rights or edm:rights" id="R2">There must be a rights statement</assert>
      <assert test="edm:isShownAt" id="R3">There must be a trackback URL</assert>
    </rule>
  </pattern>
  <pattern id="title">
    <rule context="oai_dc:dc/dcterms:title">
      <assert test="normalize-space(.)" id="T1">The title must contain text</assert>
    </rule>
  </pattern>
  <pattern id="url">
    <rule context="oai_dc:dc/edm:isShownAt">
      <assert test="starts-with(normalize-space(.),'http')" id="U1">isShownAt must be a URL</assert>
    </rule>
  </pattern>
</schema>
"""


def test_parse_schematron_subset():
    rules = parse_schematron(SCH)
    kinds = [(r.rule_id, r.kind, r.field, r.alt_field, r.arg) for r in rules]
    assert ("R1", "required", "dcterms:title", None, None) in kinds
    assert ("R2", "required", "dcterms:rights", "edm:rights", None) in kinds
    assert ("T1", "non_empty", "dcterms:title", None, None) in kinds
    assert ("U1", "starts_with", "edm:isShownAt", None, "http") in kinds
    assert len(rules) == 5


def test_parse_schematron_rejects_unknown():
    bad = SCH.replace(
        'test="dcterms:title" id="R1"', 'test="count(dcterms:title) > 2" id="R1"'
    )
    with pytest.raises(UnsupportedSchematron):
        parse_schematron(bad)


RECORDS = [
    # (record_id, fields, expected_violations)
    ("ok", {"dcterms:title": ["T"], "edm:rights": ["r"],
            "edm:isShownAt": ["http://x"]}, 0),
    ("no-title", {"dcterms:rights": ["r"], "edm:isShownAt": ["http://x"]}, 1),
    ("blank-title", {"dcterms:title": ["   "], "edm:rights": ["r"],
                     "edm:isShownAt": ["http://x"]}, 1),
    ("alt-rights-ok", {"dcterms:title": ["T"], "dcterms:rights": ["r"],
                       "edm:isShownAt": ["http://x"]}, 0),
    ("bad-url", {"dcterms:title": ["T"], "edm:rights": ["r"],
                 "edm:isShownAt": ["gopher://x"]}, 1),
    ("everything-wrong", {"dcterms:title": ["  "]}, 3),
]


@pytest.fixture(scope="module")
def dc_df(spark):
    rows = [
        (rid, {k: v for k, v in fields.items()}, f"<rec>{rid}</rec>", "f1.xml")
        for rid, fields, _ in RECORDS
    ]
    return spark.createDataFrame(
        rows,
        "record_id string, fields map<string,array<string>>, "
        "metadata_xml string, source_file string",
    )


def test_violations_matrix(spark, dc_df):
    rules = parse_schematron(SCH)
    got = {
        r.record_id: len(r.v)
        for r in dc_df.select(
            "record_id",
            violations_column(rules, F.col("fields")).alias("v"),
        ).collect()
    }
    assert got == {rid: n for rid, _, n in RECORDS}


def test_filter_with_report(spark, dc_df):
    rules = parse_schematron(SCH)
    valid, invalid = filter_with_report(dc_df, rules)
    assert valid.count() == 2
    inv = {r.id: r for r in invalid.collect()}
    assert len(inv) == 4
    # multi-violation reports newline-join messages (validate.py:219-226)
    assert inv["everything-wrong"].report.count("\n") == 2
    assert inv["everything-wrong"].record == "<rec>everything-wrong</rec>"
    assert set(invalid.columns) == {"id", "report", "record", "source_file"}


def test_report_all_never_drops(spark, dc_df):
    rules = parse_schematron(SCH)
    rep = report_all(dc_df, rules)
    assert rep.count() == len(RECORDS)
    empty_reports = rep.filter(F.col("report") == "").count()
    assert empty_reports == 2


def test_identifier_fallback_in_report(spark):
    rules = [Rule("R1", "required", "dcterms:title", "missing title")]
    df = spark.createDataFrame(
        [
            ("a", {"dcterms:identifier": ["i1", "i2"]}, "<rec>a</rec>", "f"),
            ("b", {}, "<rec>b</rec>", "f"),
        ],
        "record_id string, fields map<string,array<string>>, "
        "metadata_xml string, source_file string",
    )
    rep = {r.id: r.record for r in report_all(df, rules).collect()}
    # identifiers newline-joined; fallback to the full record
    assert rep["a"] == "i1\ni2"
    assert rep["b"] == "<rec>b</rec>"


def test_all_filtered_guard():
    guard_not_all_filtered(0, 0)  # empty input ok
    guard_not_all_filtered(5, 1)
    with pytest.raises(AllRecordsFilteredError):
        guard_not_all_filtered(5, 0)
