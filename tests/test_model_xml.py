"""Pure-Python XML model tests — mirror the reference's edge matrices
(missing/empty/duplicate 001, deleted headers, repeated DC fields) with
original fixture content."""

from __future__ import annotations

import pytest

from tulflow_spark.model import xml_parse as X

OAI_DOC = f"""<?xml version="1.0"?>
<collection xmlns="{X.OAI_NS}" dag-id="t" dag-timestamp="1">
  <record>
    <header>
      <identifier>oai:test:rec-1</identifier>
      <datestamp>2026-02-03T04:05:06Z</datestamp>
      <setSpec>alpha</setSpec>
      <setSpec>beta</setSpec>
      <setSpec>gamma</setSpec>
    </header>
    <metadata>
      <record xmlns="{X.MARC_NS}">
        <leader>00000nam a2200000 a 4500</leader>
        <controlfield tag="001">990001</controlfield>
      </record>
    </metadata>
  </record>
  <record>
    <header status="deleted">
      <identifier>oai:test:rec-2</identifier>
      <datestamp>2026-02-04</datestamp>
    </header>
  </record>
  <record>
    <header>
      <identifier>oai:test:rec-3</identifier>
      <datestamp>2026-02-05T00:00:00Z</datestamp>
    </header>
  </record>
</collection>
"""


def test_iter_oai_records_envelope():
    recs = list(X.iter_oai_records(OAI_DOC))
    assert len(recs) == 3
    r1, r2, r3 = recs
    assert r1["identifier"] == "oai:test:rec-1"
    assert r1["set_specs"] == ["alpha", "beta", "gamma"]
    assert not r1["deleted"]
    assert r1["metadata_xml"] and "controlfield" in r1["metadata_xml"]
    assert r1["datestamp"].year == 2026 and r1["datestamp"].hour == 4
    # deleted record: flag set, no metadata (harvest.py:196 semantics)
    assert r2["deleted"] and r2["metadata_xml"] is None
    # record with header but no metadata → metadata_xml NULL (harvest.py:105-107)
    assert not r3["deleted"] and r3["metadata_xml"] is None


def _marc(controlfields: str) -> str:
    return (
        f'<record xmlns="{X.MARC_NS}"><leader>L</leader>{controlfields}</record>'
    )


def test_parse_marc_001_matrix():
    # exactly one
    one = X.parse_marc(_marc('<controlfield tag="001">42</controlfield>'))
    assert [c["value"] for c in one["controlfields"]] == ["42"]
    # duplicates preserved as-is (rejection happens in the operator)
    dup = X.parse_marc(
        _marc(
            '<controlfield tag="001">1</controlfield>'
            '<controlfield tag="001">2</controlfield>'
        )
    )
    assert len(dup["controlfields"]) == 2
    # empty value preserved as None/empty
    empty = X.parse_marc(_marc('<controlfield tag="001"></controlfield>'))
    assert empty["controlfields"][0]["value"] is None
    assert X.parse_marc(None) is None


def test_parse_marc_datafields_and_roundtrip():
    xml = (
        f'<record xmlns="{X.MARC_NS}"><leader>L</leader>'
        '<controlfield tag="001">7</controlfield>'
        '<datafield tag="774" ind1="0" ind2=" ">'
        '<subfield code="w">child-1</subfield>'
        '<subfield code="w">child-2</subfield></datafield>'
        '<datafield tag="774" ind1="0" ind2=" ">'
        '<subfield code="w">child-3</subfield></datafield>'
        "</record>"
    )
    marc = X.parse_marc(xml)
    assert [d["tag"] for d in marc["datafields"]] == ["774", "774"]
    assert marc["datafields"][0]["subfields"][1]["value"] == "child-2"
    # roundtrip through the serializer re-parses identically
    again = X.parse_marc(X.marc_to_xml(marc))
    assert again == marc


def test_parse_dc_repeated_fields():
    xml = (
        '<oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"'
        ' xmlns:dcterms="http://purl.org/dc/terms/"'
        ' xmlns:edm="http://www.europeana.eu/schemas/edm/">'
        "<dcterms:title>T1</dcterms:title>"
        "<dcterms:identifier>id-a</dcterms:identifier>"
        "<dcterms:identifier>id-b</dcterms:identifier>"
        "<edm:isShownAt>http://x</edm:isShownAt>"
        "</oai_dc:dc>"
    )
    fields = X.parse_dc(xml)
    assert fields["dcterms:identifier"] == ["id-a", "id-b"]
    assert fields["edm:isShownAt"] == ["http://x"]
    assert X.parse_dc(None) is None


def test_add_marc21xml_root_ns():
    bare = "<record><leader>L</leader></record>"
    fixed = X.add_marc21xml_root_ns(bare)
    assert X.MARC_NS in fixed
    # already-namespaced input unchanged semantically
    ns = f'<record xmlns="{X.MARC_NS}"><leader>L</leader></record>'
    assert X.MARC_NS in X.add_marc21xml_root_ns(ns)
    with pytest.raises(Exception):
        X.add_marc21xml_root_ns("<record>not closed")


def test_read_oai_collections_spark(spark, tmp_path):
    d = tmp_path / "xml"
    d.mkdir()
    (d / "a.xml").write_text(OAI_DOC)
    (d / "b.xml").write_text(OAI_DOC.replace("rec-", "other-"))
    df = X.read_oai_collections(spark, str(d))
    rows = df.collect()
    assert len(rows) == 6
    assert {r.source_file.split("/")[-1] for r in rows} == {"a.xml", "b.xml"}
    assert sum(1 for r in rows if r.deleted) == 2


def test_parser_udfs(spark):
    udfs = X.register_udfs()
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(_marc('<controlfield tag="001">9</controlfield>'),), (None,)],
        ["xml"],
    ).withColumn("marc", udfs["parse_marc"](F.col("xml")))
    got = df.select("marc").collect()
    assert got[0].marc.controlfields[0].value == "9"
    assert got[1].marc.leader is None


def test_large_record_regression():
    """Very large single record (the reference carries a 24k-line fixture
    for a historical lxml crash, tests/test_devo-256_lxml_bug.py) — our
    parser must handle megabyte-scale records with thousands of fields."""
    datafields = "".join(
        f'<datafield tag="{500 + (i % 400)}" ind1=" " ind2=" ">'
        f'<subfield code="a">value {i} {"x" * 80}</subfield></datafield>'
        for i in range(10_000)
    )
    xml = (
        f'<record xmlns="{X.MARC_NS}"><leader>L</leader>'
        f'<controlfield tag="001">big</controlfield>{datafields}</record>'
    )
    assert len(xml) > 1_000_000
    marc = X.parse_marc(xml)
    assert len(marc["datafields"]) == 10_000
    assert marc["controlfields"][0]["value"] == "big"
    # and the envelope path survives it too
    doc = (
        f'<collection xmlns="{X.OAI_NS}"><record><header>'
        f"<identifier>oai:big:1</identifier></header>"
        f"<metadata>{xml}</metadata></record></collection>"
    )
    recs = list(X.iter_oai_records(doc))
    assert len(recs) == 1 and len(recs[0]["metadata_xml"]) > 1_000_000
