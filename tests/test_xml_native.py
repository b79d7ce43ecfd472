"""Native (from_xml) MARC parser must agree with the Python UDF parser on
the 001 edge matrix and structured payloads."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tulflow_spark.model.xml_native import parse_marc_native
from tulflow_spark.model.xml_parse import MARC_NS, register_udfs
from tulflow_spark.operators.marc import record_001, subfield_values

CASES = [
    # exactly one 001
    f'<record xmlns="{MARC_NS}"><leader>L</leader>'
    '<controlfield tag="001">42</controlfield></record>',
    # duplicate 001
    f'<record xmlns="{MARC_NS}"><controlfield tag="001">1</controlfield>'
    '<controlfield tag="001">2</controlfield></record>',
    # missing 001, repeated datafields with subfields
    f'<record xmlns="{MARC_NS}"><datafield tag="774" ind1="0" ind2=" ">'
    '<subfield code="w">c1</subfield><subfield code="w">c2</subfield>'
    '</datafield><datafield tag="774" ind1="0" ind2=" ">'
    '<subfield code="w">c3</subfield></datafield></record>',
    # empty 001 text
    f'<record xmlns="{MARC_NS}"><controlfield tag="001"> </controlfield></record>',
    None,
]


@pytest.fixture(scope="module")
def parsed(spark):
    udfs = register_udfs()
    df = spark.createDataFrame([(i, x) for i, x in enumerate(CASES)], "i int, xml string")
    return df.select(
        "i",
        udfs["parse_marc"](F.col("xml")).alias("py"),
        parse_marc_native(F.col("xml")).alias("native"),
    )


def test_native_matches_python_parser(parsed):
    # from_xml parses whitespace-only text as NULL; the ET parser keeps the
    # literal whitespace — equivalent downstream, normalized for comparison.
    for row in parsed.collect():
        if row.native is None:
            # NULL input: python UDF yields all-null struct, native yields NULL
            assert row.py.leader is None and row.py.controlfields is None
            continue
        assert row.native.leader == row.py.leader, row.i
        native_cf = [(c.tag, c.value if (c.value or "").strip() else None)
                     for c in row.native.controlfields]
        py_cf = [(c.tag, c.value if (c.value or "").strip() else None)
                 for c in (row.py.controlfields or [])]
        assert native_cf == py_cf, row.i
        assert row.native.datafields == (row.py.datafields or []), row.i


def test_operators_work_on_native_structs(parsed):
    got = {
        r.i: (r.rid, r.w)
        for r in parsed.select(
            "i",
            record_001(F.col("native")).alias("rid"),
            subfield_values(F.col("native"), "774", "w").alias("w"),
        ).collect()
    }
    assert got[0] == ("42", [])
    assert got[1][0] is None          # duplicate 001 rejected
    assert got[2] == (None, ["c1", "c2", "c3"])
    assert got[3][0] is None          # whitespace-only 001 rejected
