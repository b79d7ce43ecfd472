"""Transform tests: XSLT-subset compiler + column application, covering the
reference stylesheets' constructs (rename/normalize, regex vocabulary
dispatch with otherwise-routing, drop-deleted, record marker filter) with an
original stylesheet."""

from __future__ import annotations

import pytest

from tulflow_spark.transform import (
    UnsupportedXslt,
    compile_xslt,
    transform_records,
)

XSL = """<?xml version="1.0" encoding="UTF-8"?>
<xsl:stylesheet xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmlns:dcterms="http://purl.org/dc/terms/"
    xmlns:oai="http://www.openarchives.org/OAI/2.0/"
    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
    version="2.0">
  <xsl:output method="xml" encoding="UTF-8"/>
  <xsl:template match="text() | @*"/>
  <xsl:template match="//oai:record[oai:header[@status='deleted']]/*"/>
  <xsl:template match="//oai_dc:dc[not(dc:relation[string()= 'skip_me'])]">
    <oai_dc:dc><xsl:apply-templates /></oai_dc:dc>
  </xsl:template>
  <xsl:template match="dc:title">
    <xsl:if test="normalize-space(.)!=''">
      <xsl:element name="dcterms:title">
        <xsl:value-of select="normalize-space(.)"/>
      </xsl:element>
    </xsl:if>
  </xsl:template>
  <xsl:template match="dc:type">
    <xsl:if test="normalize-space(.)!=''">
      <xsl:choose>
        <xsl:when test="matches(., '(^text.*$)', 'i')">
          <dcterms:type>Text</dcterms:type>
        </xsl:when>
        <xsl:when test="matches(., '^(movingimage.*$|moving\\simage.*$)', 'i')">
          <dcterms:type>Moving Image</dcterms:type>
        </xsl:when>
        <xsl:otherwise>
          <dcterms:format><xsl:value-of select="."/></dcterms:format>
        </xsl:otherwise>
      </xsl:choose>
    </xsl:if>
  </xsl:template>
</xsl:stylesheet>
"""


def test_compile_xslt_structure():
    sheet = compile_xslt(XSL)
    assert sheet.drop_deleted
    assert sheet.record_filters[0].exclude_field == "dc:relation"
    assert sheet.record_filters[0].exclude_value == "skip_me"
    by_field = {t.match_field: t for t in sheet.templates}
    assert by_field["dc:title"].require_non_empty
    assert by_field["dc:title"].cases[0].out_field == "dcterms:title"
    type_cases = by_field["dc:type"].cases
    assert [c.out_value for c in type_cases] == ["Text", "Moving Image", None]
    assert type_cases[2].out_field == "dcterms:format"


def test_compile_xslt_rejects_unknown():
    with pytest.raises(UnsupportedXslt):
        compile_xslt(
            XSL.replace("matches(., '(^text.*$)', 'i')", "position() = 1")
        )


ROWS = [
    # (id, deleted, fields)
    ("plain", False, {"dc:title": ["  A   Title  "], "dc:type": ["text thing"]}),
    ("moving", False, {"dc:title": ["B"], "dc:type": ["Moving image reel"]}),
    ("fmt", False, {"dc:title": ["C"], "dc:type": ["35mm slide"]}),
    ("empty-title", False, {"dc:title": ["   "], "dc:type": []}),
    ("dropped-marker", False, {"dc:title": ["D"], "dc:relation": ["skip_me"]}),
    ("dropped-deleted", True, {"dc:title": ["E"]}),
    ("unmapped-field", False, {"dc:title": ["F"], "dc:subject": ["kept? no"]}),
]


@pytest.fixture(scope="module")
def records_df(spark):
    return spark.createDataFrame(
        ROWS, "record_id string, deleted boolean, fields map<string,array<string>>"
    )


def test_transform_records(spark, records_df):
    out = {
        r.record_id: r.fields
        for r in transform_records(records_df, XSL).collect()
    }
    # record-level drops
    assert "dropped-marker" not in out
    assert "dropped-deleted" not in out
    # rename + normalize-space
    assert out["plain"]["dcterms:title"] == ["A Title"]
    # vocabulary dispatch (case-insensitive regex)
    assert out["plain"]["dcterms:type"] == ["Text"]
    assert out["moving"]["dcterms:type"] == ["Moving Image"]
    # otherwise → different output field, raw passthrough
    assert out["fmt"]["dcterms:format"] == ["35mm slide"]
    assert "dcterms:type" not in out["fmt"]
    # empty values skipped entirely
    assert "dcterms:title" not in out["empty-title"]
    # unmapped input fields dropped (stylesheet's drop-everything-else)
    assert "dc:subject" not in out["unmapped-field"]
    assert set(out["unmapped-field"].keys()) == {"dcterms:title"}
