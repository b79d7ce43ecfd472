"""Byte-golden serialization + widened XSLT subset (r3 VERDICT #6/#7).

The parity target is the reference's own assertion: transformed record
bytes equal `tests/fixtures/xsl-sample-*-output-record*.xml` exactly
(reference tests/test_transform.py:53-58,114-121).  When the reference
checkout is present we run the full pipeline — parse the OAI fixture,
compile the collection stylesheet with its temple.xsl include, serialize —
and compare bytes; the synthetic tests below pin the same layout rules
without the checkout.
"""

from __future__ import annotations

import os

import pytest

from tulflow_spark.transform import compile_xslt
from tulflow_spark.transform.serialize import (
    ordered_entries,
    serialize_record,
    transform_to_xml,
    wrapper_ns_decls,
)

REF_FX = "/root/reference/tests/fixtures"

XSL = """<?xml version="1.0" encoding="UTF-8"?>
<xsl:stylesheet xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
    xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmlns:dcterms="http://purl.org/dc/terms/"
    xmlns:edm="http://www.europeana.eu/schemas/edm/"
    xmlns:oai="http://www.openarchives.org/OAI/2.0/"
    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
    version="2.0">
  <xsl:template match="text() | @*"/>
  <xsl:template match="//oai:record[oai:header[@status='deleted']]/*"/>
  <xsl:template match="//oai_dc:dc[not(dc:relation[string()= 'skip_me'])]">
    <oai_dc:dc
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        xmlns:dc="http://purl.org/dc/elements/1.1/"
        xmlns:dcterms="http://purl.org/dc/terms/"
        xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
      <xsl:apply-templates />
      <xsl:call-template name="hub"/>
    </oai_dc:dc>
  </xsl:template>
  <xsl:template match="dc:title">
    <xsl:if test="normalize-space(.)!=''">
      <xsl:element name="dcterms:title">
        <xsl:value-of select="normalize-space(.)"/>
      </xsl:element>
    </xsl:if>
  </xsl:template>
  <xsl:template match="dc:rights">
    <xsl:choose>
      <xsl:when test="starts-with(., 'http://rightsstatements.org/') or starts-with(., 'https://creativecommons.org/')">
        <xsl:if test="normalize-space(.)!=''">
          <xsl:element name="edm:rights">
            <xsl:value-of select="normalize-space(.)"/>
          </xsl:element>
        </xsl:if>
      </xsl:when>
      <xsl:otherwise>
        <xsl:if test="normalize-space(.)!=''">
          <xsl:element name="dcterms:rights">
            <xsl:value-of select="normalize-space(.)"/>
          </xsl:element>
        </xsl:if>
      </xsl:otherwise>
    </xsl:choose>
  </xsl:template>
  <xsl:template match="dc:subject">
    <xsl:call-template name="subj_template">
      <xsl:with-param name="stringz" select="."/>
      <xsl:with-param name="delimiter" select="';'"/>
    </xsl:call-template>
  </xsl:template>
  <xsl:template match="dc:source">
    <xsl:copy-of select="."/>
  </xsl:template>
  <xsl:template name="hub">
    <xsl:element name="edm:provider">
      <xsl:value-of>PA Digital</xsl:value-of>
    </xsl:element>
  </xsl:template>
  <xsl:template name="subj_template">
    <xsl:param name="stringz"/>
    <xsl:param name="delimiter"/>
    <xsl:choose>
      <xsl:when test="contains($stringz, $delimiter)">
        <xsl:variable name="newstem" select="substring-after($stringz, $delimiter)"/>
        <dcterms:subject>
          <xsl:value-of select="substring-before($stringz, $delimiter)"/>
        </dcterms:subject>
        <xsl:call-template name="subj_template">
          <xsl:with-param name="stringz" select="$newstem"/>
          <xsl:with-param name="delimiter" select="';'"/>
        </xsl:call-template>
      </xsl:when>
      <xsl:otherwise>
        <dcterms:subject>
          <xsl:value-of select="normalize-space($stringz)"/>
        </dcterms:subject>
      </xsl:otherwise>
    </xsl:choose>
  </xsl:template>
</xsl:stylesheet>
"""


def test_widened_subset_compiles():
    sheet = compile_xslt(XSL)
    by = {t.match_field: t for t in sheet.templates}
    # starts-with dispatch with branch-level non-empty guard
    rights = by["dc:rights"].cases
    assert rights[0].prefixes == (
        "http://rightsstatements.org/", "https://creativecommons.org/"
    )
    assert rights[0].out_field == "edm:rights" and rights[0].skip_empty
    assert rights[1].prefixes is None and rights[1].out_field == "dcterms:rights"
    # recursive delimiter-split named template
    assert by["dc:subject"].split_delimiter == ";"
    assert by["dc:subject"].cases[0].out_field == "dcterms:subject"
    # copy-of passthrough keeps the matched name
    assert by["dc:source"].cases[0].out_field == "dc:source"
    assert by["dc:source"].cases[0].normalize is False
    # constant named template called from the root template
    assert sheet.constants == (("edm:provider", "PA Digital"),)


def test_wrapper_ns_decl_order():
    """Wrapper declarations first (document order, xsl excluded), then the
    stylesheet root's remaining in-scope declarations — the Saxon layout the
    reference's golden files pin."""
    qname, decls = wrapper_ns_decls(XSL)
    assert qname == "oai_dc:dc"
    assert [p for p, _ in decls] == [
        "dc", "dcterms", "oai_dc",           # wrapper order
        "xsi", "edm", "oai",                 # root extras in root order
    ]


ROWS = [
    (
        "r1",
        False,
        {
            "dc:title": ["  A   Title  "],
            "dc:rights": ["https://creativecommons.org/publicdomain/"],
            "dc:subject": ["alpha; beta;gamma"],
            "dc:source": ["  raw <source>  "],
        },
        ["dc:title", "dc:rights", "dc:subject", "dc:source"],
    ),
    (
        "r2",
        False,
        {"dc:rights": ["All rights reserved"], "dc:title": ["B"]},
        ["dc:rights", "dc:title"],
    ),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS,
        "id string, deleted boolean,"
        " fields map<string,array<string>>, forder array<string>",
    )


def test_dispatch_split_and_constants(spark, df):
    out = {
        r.id: r.xml
        for r in transform_to_xml(df, XSL, order_col="forder").collect()
    }
    # r1: URI rights → edm:rights; split subjects: intermediate pieces RAW
    # (' beta' keeps its leading space), final piece normalize-spaced;
    # copy-of passthrough keeps raw text but escapes <>; hub constant last;
    # emission follows input order (title, rights, subject, source)
    assert out["r1"] == (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<oai_dc:dc xmlns:dc="http://purl.org/dc/elements/1.1/"'
        ' xmlns:dcterms="http://purl.org/dc/terms/"'
        ' xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"'
        ' xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"'
        ' xmlns:edm="http://www.europeana.eu/schemas/edm/"'
        ' xmlns:oai="http://www.openarchives.org/OAI/2.0/">'
        "<dcterms:title>A Title</dcterms:title>"
        "<edm:rights>https://creativecommons.org/publicdomain/</edm:rights>"
        "<dcterms:subject>alpha</dcterms:subject>"
        "<dcterms:subject> beta</dcterms:subject>"
        "<dcterms:subject>gamma</dcterms:subject>"
        "<dc:source>  raw &lt;source&gt;  </dc:source>"
        "<edm:provider>PA Digital</edm:provider>"
        "</oai_dc:dc>\n"
    )
    # r2: text rights → dcterms:rights; input order rights-then-title
    assert (
        "<dcterms:rights>All rights reserved</dcterms:rights>"
        "<dcterms:title>B</dcterms:title>" in out["r2"]
    )


def test_constant_attribute_constructors(spark):
    xsl = XSL.replace(
        '<xsl:element name="dcterms:title">',
        '<xsl:element name="dcterms:title">'
        '<xsl:attribute name="xml:lang">en</xsl:attribute>',
        1,
    )
    sheet = compile_xslt(xsl)
    title = {t.match_field: t for t in sheet.templates}["dc:title"]
    assert title.cases[0].attrs == (("xml:lang", "en"),)
    df = _single(spark, {"dc:title": ["T"]}, ["dc:title"])
    out = transform_to_xml(df, xsl, order_col="forder").collect()[0].xml
    assert '<dcterms:title xml:lang="en">T</dcterms:title>' in out


def _single(spark, fields, order):
    return spark.createDataFrame(
        [("x", False, fields, order)],
        "id string, deleted boolean,"
        " fields map<string,array<string>>, forder array<string>",
    )


@pytest.mark.skipif(
    not os.path.isdir(REF_FX), reason="reference checkout not present"
)
@pytest.mark.parametrize("name", ["simple", "complex"])
def test_reference_golden_bytes(spark, name):
    """End-to-end byte parity with the reference's Saxon output: parse its
    OAI fixture, compile its stylesheet (complex pulls in temple.xsl via
    includes=), serialize, and compare EXACT bytes per record — the same
    assertion as reference tests/test_transform.py:53-58,114-121."""
    from tulflow_spark.model.xml_parse import iter_oai_records, parse_dc

    recs = list(iter_oai_records(open(f"{REF_FX}/xsl-sample.xml").read()))
    rows = []
    for r in recs:
        fields = parse_dc(r["metadata_xml"])
        rows.append((r["identifier"], r["deleted"], fields, list(fields)))
    df = spark.createDataFrame(
        rows,
        "id string, deleted boolean,"
        " fields map<string,array<string>>, forder array<string>",
    )
    includes = (
        (open(f"{REF_FX}/temple.xsl").read(),) if name == "complex" else ()
    )
    out = transform_to_xml(
        df,
        open(f"{REF_FX}/xsl-sample-{name}.xsl").read(),
        includes=includes,
        order_col="forder",
    )
    got = {r.id: r.xml for r in out.collect()}
    assert len(got) == 3
    for i, rec in enumerate(recs, 1):
        golden = open(
            f"{REF_FX}/xsl-sample-{name}-output-record{i}.xml"
        ).read()
        assert got[rec["identifier"]] == golden, f"record{i} bytes differ"
