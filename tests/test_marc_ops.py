"""MARC operator tests over the struct model — the reference's
record-001/boundwith edge matrices (process.py:66-92, harvest.py:218-250)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tulflow_spark.model.schemas import MARC_TYPE
from tulflow_spark.operators import marc as M


def _marc_row(controlfields, datafields=None):
    return {
        "leader": "L",
        "controlfields": controlfields,
        "datafields": datafields or [],
    }


@pytest.fixture(scope="module")
def marc_df(spark):
    rows = [
        ("one", _marc_row([{"tag": "001", "value": "123"}])),
        (
            "dup",
            _marc_row(
                [{"tag": "001", "value": "1"}, {"tag": "001", "value": "2"}]
            ),
        ),
        ("empty", _marc_row([{"tag": "001", "value": "  "}])),
        ("missing", _marc_row([{"tag": "035", "value": "x"}])),
        ("nonnum", _marc_row([{"tag": "001", "value": "abc"}])),
    ]
    return spark.createDataFrame(
        rows, schema=f"name string, marc {MARC_TYPE.simpleString()}"
    )


def test_record_001_matrix(marc_df):
    got = {
        r.name: r.rid
        for r in marc_df.select(
            "name", M.record_001(F.col("marc")).alias("rid")
        ).collect()
    }
    # exactly-one → value; dup/empty/missing → NULL (process.py:70-80)
    assert got == {
        "one": "123",
        "dup": None,
        "empty": None,
        "missing": None,
        "nonnum": "abc",
    }


def test_subfield_values(spark):
    df = spark.createDataFrame(
        [
            (
                _marc_row(
                    [],
                    [
                        {
                            "tag": "774",
                            "ind1": "0",
                            "ind2": " ",
                            "subfields": [
                                {"code": "w", "value": "c1"},
                                {"code": "t", "value": "title"},
                            ],
                        },
                        {
                            "tag": "774",
                            "ind1": "0",
                            "ind2": " ",
                            "subfields": [{"code": "w", "value": "c2"}],
                        },
                    ],
                ),
            )
        ],
        schema=f"marc {MARC_TYPE.simpleString()}",
    )
    vals = df.select(
        M.subfield_values(F.col("marc"), "774", "w").alias("w")
    ).head().w
    assert vals == ["c1", "c2"]


def test_boundwith_enrich(spark, marc_df):
    lookup = spark.createDataFrame(
        [(123, 900, "<a>f1</a>||<b>f2</b>")],
        "child_id bigint, parent_id bigint, parent_xml string",
    )
    out = M.boundwith_enrich(marc_df, lookup).collect()
    by_name = {r.name: r for r in out}
    # match: parent fragments split on ||, ADF datafield appended
    hit = by_name["one"]
    assert hit.parent_fragments == ["<a>f1</a>", "<b>f2</b>"]
    adf = [d for d in hit.marc.datafields if d.tag == "ADF"]
    assert len(adf) == 1
    assert adf[0].subfields[0].code == "a"
    assert adf[0].subfields[0].value == "900"
    # no match (left join keeps the record, marc untouched)
    assert by_name["missing"].parent_fragments is None
    assert [d.tag for d in by_name["missing"].marc.datafields] == []
    # non-numeric 001 → bigint cast NULL → never matches (harvest.py:238)
    assert by_name["nonnum"].parent_fragments is None
    # join is broadcast (no fact-side shuffle)
    plan = M.boundwith_enrich(marc_df, lookup)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _uppercase_hook(el):
    """module-level (picklable) Element hook used by the parser-kwarg test."""
    for child in el.iter():
        if child.text and child.text.strip():
            child.text = child.text.upper()
    return None if el.get("drop") == "yes" else el


def test_apply_record_parser_hook(spark):
    from tulflow_spark.operators.parser_hook import apply_record_parser

    df = spark.createDataFrame(
        [
            ("keep", "<rec><v>hello</v></rec>"),
            ("drop", '<rec drop="yes"><v>bye</v></rec>'),
            ("null", None),
        ],
        "name string, metadata_xml string",
    )
    out = {r.name: r.metadata_xml for r in apply_record_parser(df, _uppercase_hook).collect()}
    assert set(out) == {"keep", "null"}          # hook dropped one record
    assert "<v>HELLO</v>" in out["keep"]         # hook transformed payload
    assert out["null"] is None                   # NULL passes through


def test_boundwith_enrich_dedupes_lookup(spark, marc_df):
    """Duplicated child_id rows in the lookup must not multiply record rows —
    the reference uses only the first match (harvest.py:239-241); here the
    deterministic 'first' is the lowest parent_id."""
    lookup = spark.createDataFrame(
        [(123, 901, "<b>late</b>"), (123, 900, "<a>first</a>")],
        "child_id bigint, parent_id bigint, parent_xml string",
    )
    out = M.boundwith_enrich(marc_df, lookup).collect()
    names = [r.name for r in out]
    assert len(names) == len(set(names))  # no duplication from the join
    hit = {r.name: r for r in out}["one"]
    assert hit.parent_fragments == ["<a>first</a>"]
    adf = [d for d in hit.marc.datafields if d.tag == "ADF"]
    assert [s.value for s in adf[0].subfields] == ["900"]
