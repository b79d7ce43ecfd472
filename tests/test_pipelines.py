"""End-to-end pipeline tests: harvest-route-write → transform → validate,
chained over a staging directory exactly like the reference's DAG stages."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest

from tulflow_spark import pipelines as P
from tulflow_spark.model.xml_parse import read_oai_collections
from tulflow_spark.validation.ops import AllRecordsFilteredError

DC = (
    '<oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"'
    ' xmlns:dc="http://purl.org/dc/elements/1.1/"'
    ' xmlns:dcterms="http://purl.org/dc/terms/"'
    ' xmlns:edm="http://www.europeana.eu/schemas/edm/">{}</oai_dc:dc>'
)

ROWS = [
    # valid after transform
    ("oai:p:1", False, DC.format(
        "<dc:title>  Good   Record </dc:title><dc:type>text doc</dc:type>"
        "<dc:rights>ok</dc:rights><dc:shownat>http://x/1</dc:shownat>")),
    # whitespace title → dropped by transform's non-empty guard → invalid later
    ("oai:p:2", False, DC.format(
        "<dc:title>   </dc:title><dc:rights>ok</dc:rights>"
        "<dc:shownat>http://x/2</dc:shownat>")),
    # deleted record → routed to deleted stage, never transformed
    ("oai:p:3", True, None),
    # valid, type dispatches to Moving Image
    ("oai:p:4", False, DC.format(
        "<dc:title>B</dc:title><dc:type>Moving Image Reel</dc:type>"
        "<dc:rights>ok</dc:rights><dc:shownat>http://x/4</dc:shownat>")),
]

XSL = """<?xml version="1.0" encoding="UTF-8"?>
<xsl:stylesheet xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmlns:dcterms="http://purl.org/dc/terms/"
    xmlns:edm="http://www.europeana.eu/schemas/edm/"
    xmlns:oai="http://www.openarchives.org/OAI/2.0/"
    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/" version="2.0">
  <xsl:template match="text() | @*"/>
  <xsl:template match="//oai:record[oai:header[@status='deleted']]/*"/>
  <xsl:template match="dc:title">
    <xsl:if test="normalize-space(.)!=''">
      <xsl:element name="dcterms:title"><xsl:value-of select="normalize-space(.)"/></xsl:element>
    </xsl:if>
  </xsl:template>
  <xsl:template match="dc:type">
    <xsl:if test="normalize-space(.)!=''">
      <xsl:choose>
        <xsl:when test="matches(., '(^text.*$)', 'i')"><dcterms:type>Text</dcterms:type></xsl:when>
        <xsl:when test="matches(., '^(movingimage.*$|moving\\simage.*$)', 'i')"><dcterms:type>Moving Image</dcterms:type></xsl:when>
        <xsl:otherwise><dcterms:format><xsl:value-of select="."/></dcterms:format></xsl:otherwise>
      </xsl:choose>
    </xsl:if>
  </xsl:template>
  <xsl:template match="dc:rights">
    <xsl:if test="normalize-space(.)!=''">
      <xsl:element name="dcterms:rights"><xsl:value-of select="normalize-space(.)"/></xsl:element>
    </xsl:if>
  </xsl:template>
  <xsl:template match="dc:shownat">
    <xsl:if test="normalize-space(.)!=''">
      <xsl:element name="edm:isShownAt"><xsl:value-of select="normalize-space(.)"/></xsl:element>
    </xsl:if>
  </xsl:template>
</xsl:stylesheet>
"""

SCH = """<?xml version="1.0"?>
<schema xmlns="http://purl.oclc.org/dsdl/schematron">
  <pattern id="req">
    <rule context="oai_dc:dc">
      <assert test="dcterms:title" id="R1">There must be a title</assert>
      <assert test="dcterms:rights" id="R2">There must be rights</assert>
      <assert test="edm:isShownAt" id="R3">There must be a URL</assert>
    </rule>
  </pattern>
  <pattern id="url">
    <rule context="oai_dc:dc/edm:isShownAt">
      <assert test="starts-with(normalize-space(.),'http')" id="U1">must be http</assert>
    </rule>
  </pattern>
</schema>
"""


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """Run harvest → transform → validate across a staging dir once."""
    base = str(tmp_path_factory.mktemp("stage"))
    env = spark.createDataFrame(
        [
            (ident, datetime(2026, 1, 1, tzinfo=timezone.utc), ["s"], dele, md)
            for ident, dele, md in ROWS
        ],
        "identifier string, datestamp timestamp, set_specs array<string>, "
        "deleted boolean, metadata_xml string",
    )
    res = P.harvest_to_staging(env, base, "dagx", "20260101", records_per_file=2)
    harvest_dir = os.path.join(base, "dagx", "20260101")
    n_tx = P.transform_staging(
        spark,
        os.path.join(harvest_dir, "new-updated"),
        os.path.join(harvest_dir, "transformed"),
        XSL,
    )
    val = P.validate_staging(
        spark,
        os.path.join(harvest_dir, "transformed"),
        os.path.join(harvest_dir, "validated"),
        os.path.join(harvest_dir, "report"),
        SCH,
    )
    return base, harvest_dir, res, n_tx, val


def test_harvest_routing(staged, spark):
    _, harvest_dir, res, _, _ = staged
    assert res.updated == 3 and res.deleted == 1
    upd = read_oai_collections(spark, os.path.join(harvest_dir, "new-updated"))
    dele = read_oai_collections(spark, os.path.join(harvest_dir, "deleted"))
    assert upd.count() == 3
    assert dele.count() == 1
    assert dele.head().deleted


def test_transform_stage(staged, spark):
    _, harvest_dir, _, n_tx, _ = staged
    assert n_tx == 3
    from tulflow_spark.model.xml_parse import parse_dc

    tx = read_oai_collections(spark, os.path.join(harvest_dir, "transformed"))
    # prefixes get rewritten by the serializer; compare parsed semantics
    fields = {r.identifier: parse_dc(r.metadata_xml) for r in tx.collect()}
    assert fields["oai:p:1"]["dcterms:title"] == ["Good Record"]
    assert fields["oai:p:1"]["dcterms:type"] == ["Text"]
    assert fields["oai:p:4"]["dcterms:type"] == ["Moving Image"]
    # whitespace title dropped by the transform
    assert "dcterms:title" not in fields["oai:p:2"]


def test_validate_stage(staged, spark):
    _, harvest_dir, _, _, val = staged
    assert (val.total, val.valid, val.filtered) == (3, 2, 1)
    ok = read_oai_collections(spark, os.path.join(harvest_dir, "validated"))
    assert {r.identifier for r in ok.collect()} == {"oai:p:1", "oai:p:4"}
    report_dir = os.path.join(harvest_dir, "report")
    csvs = [f for f in os.listdir(report_dir) if f.endswith(".csv")]
    content = open(os.path.join(report_dir, csvs[0])).read()
    assert "oai:p:2" in content and "There must be a title" in content


def test_all_filtered_guard_fires(spark, tmp_path):
    env = spark.createDataFrame(
        [
            (
                "oai:x:1",
                datetime(2026, 1, 1, tzinfo=timezone.utc),
                ["s"],
                False,
                DC.format("<dc:junk>z</dc:junk>"),
            )
        ],
        "identifier string, datestamp timestamp, set_specs array<string>, "
        "deleted boolean, metadata_xml string",
    )
    base = str(tmp_path)
    P.harvest_to_staging(env, base, "d", "t")
    src = os.path.join(base, "d", "t", "new-updated")
    with pytest.raises(AllRecordsFilteredError):
        P.validate_staging(
            spark, src, os.path.join(base, "v"), os.path.join(base, "r"), SCH
        )


def test_parquet_staging_end_to_end(spark, tmp_path):
    """stage_format='parquet': same pipeline semantics, columnar staging
    (no XML re-parse at stage boundaries)."""
    base = str(tmp_path)
    env = spark.createDataFrame(
        [
            (ident, datetime(2026, 1, 1, tzinfo=timezone.utc), ["s"], dele, md)
            for ident, dele, md in ROWS
        ],
        "identifier string, datestamp timestamp, set_specs array<string>, "
        "deleted boolean, metadata_xml string",
    )
    res = P.harvest_to_staging(env, base, "pq", "t", stage_format="parquet")
    assert res.updated == 3 and res.deleted == 1
    hdir = os.path.join(base, "pq", "t")
    n_tx = P.transform_staging(
        spark, os.path.join(hdir, "new-updated"),
        os.path.join(hdir, "transformed"), XSL, stage_format="parquet",
    )
    assert n_tx == 3
    val = P.validate_staging(
        spark, os.path.join(hdir, "transformed"),
        os.path.join(hdir, "validated"), os.path.join(hdir, "report"),
        SCH, stage_format="parquet",
    )
    assert (val.total, val.valid, val.filtered) == (3, 2, 1)
    out = spark.read.parquet(os.path.join(hdir, "validated"))
    assert {r.identifier for r in out.collect()} == {"oai:p:1", "oai:p:4"}
    # the staged files really are parquet, not XML
    assert any(f.endswith(".parquet") for f in os.listdir(os.path.join(hdir, "new-updated")))


def test_dc_to_xml_escapes_entities(spark):
    """Values containing XML entities must serialize to well-formed XML
    (ADVICE r1: 'AT&T' previously produced malformed metadata_xml)."""
    import xml.etree.ElementTree as ET

    from pyspark.sql import functions as F

    df = spark.createDataFrame([("AT&T <scores> 3>2 &amp; raw",)], "v string")
    xml = df.select(
        P._dc_to_xml(
            F.create_map(F.lit("dc:title"), F.array(F.col("v")))
        ).alias("x")
    ).head().x
    el = ET.fromstring(xml)  # must parse
    assert el[0].text == "AT&T <scores> 3>2 &amp; raw"


def test_full_dag_indexes_to_solr(staged, spark):
    """The reference's complete DAG in one pass — harvest → transform →
    validate → index to SolrCloud (reference: cob_datapipeline /
    funcake_dags wiring around tulflow): the validated stage's records are
    projected to JSON docs and posted to a live fake SolrCloud; only the
    record that survived transformation AND validation lands in the index."""
    import threading
    from http.server import HTTPServer

    from pyspark.sql import functions as F

    from tests.test_solr import STATE, FakeSolr
    from tulflow_spark.model.xml_parse import read_oai_collections
    from tulflow_spark.sinks.solr import index_to_solr

    _, harvest_dir, _, _, _ = staged
    validated = read_oai_collections(
        spark, os.path.join(harvest_dir, "validated")
    )
    docs = validated.select(
        F.col("identifier").alias("id"),
        F.expr(
            "xpath_string(metadata_xml, \"//*[local-name()='title']\")"
        ).alias("title"),
    )

    server = HTTPServer(("127.0.0.1", 0), FakeSolr)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        STATE["posted_docs"].clear()
        STATE["commits"] = 0
        url = f"http://127.0.0.1:{server.server_address[1]}/solr"
        index_to_solr(docs, url, "catalog-blue", batch_size=10)
    finally:
        server.shutdown()

    by_id = {d["id"]: d for d in STATE["posted_docs"]}
    # record 1 survived (valid after transform); 2 was dropped by
    # validation (empty title); 3 was deleted at harvest; 4 survived
    assert set(by_id) == {"oai:p:1", "oai:p:4"}
    assert by_id["oai:p:1"]["title"] == "Good Record"
    assert STATE["commits"] == 1
