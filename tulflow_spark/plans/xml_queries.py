"""XML-surface correctness queries: build XML from star-table columns inside
Spark, push it through the real parsing/extraction/validation operators, and
compare the round-trip against the original columns via the DuckDB oracle.

This is how the XML stack (xpath functions, MARC struct parser + record_001,
schematron-subset compiler) gets driver-gate coverage even though the oracle
tables contain no XML.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tulflow_spark.io import table
from tulflow_spark.plans import register

# ---------------------------------------------------------------------------
# x1: Spark SQL xpath family (SURVEY §2.8 — XPath evaluation surface)
# ---------------------------------------------------------------------------


@register(
    "x1_xpath_extract",
    oracle="""
    SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents GROUP BY lang
    """,
)
def x1_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: columns → XML string → xpath_string/xpath_long → rollup.
    Uses Spark's built-in JVM xpath expressions (no UDF)."""
    d = table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<rec><id>"), F.col("doc_id").cast("string"), F.lit("</id><lang>"),
        F.col("lang"), F.lit("</lang></rec>"),
    )
    return (
        d.withColumn("xml", xml)
        .select(
            F.expr("xpath_string(xml, '/rec/lang')").alias("lang"),
            F.expr("xpath_long(xml, '/rec/id')").alias("id"),
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").cast("bigint").alias("id_sum"))
    )


# ---------------------------------------------------------------------------
# x2: MARC struct parser + record_001 extraction (SURVEY §2.3 P3/P4/S3)
# ---------------------------------------------------------------------------


@register(
    "x2_marc_roundtrip",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS record_id,
           o_orderpriority AS priority
    FROM orders
    """,
)
def x2_marc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build MARC21/slim XML per order, parse with the Arrow-batched
    xml.etree UDF, extract 001 + a subfield with the struct operators —
    the full ingest path of the reference (process.py:66-92) under oracle
    check."""
    from tulflow_spark.io import widen
    from tulflow_spark.model.xml_parse import register_udfs
    from tulflow_spark.operators.marc import record_001, subfield_values

    udfs = register_udfs()
    o = widen(table(spark, sf_dir, "orders"))
    xml = F.concat(
        F.lit('<record xmlns="http://www.loc.gov/MARC21/slim">'
              '<controlfield tag="001">'),
        F.col("o_orderkey").cast("string"),
        F.lit('</controlfield><datafield tag="900" ind1=" " ind2=" ">'
              '<subfield code="a">'),
        F.col("o_orderpriority"),
        F.lit("</subfield></datafield></record>"),
    )
    marc = o.withColumn("marc", udfs["parse_marc"](xml))
    return marc.select(
        record_001(F.col("marc")).alias("record_id"),
        F.get(subfield_values(F.col("marc"), "900", "a"), 0).alias("priority"),
    )


# ---------------------------------------------------------------------------
# x3: schematron-subset rule compiler (SURVEY §2.4 V1-V3)
# ---------------------------------------------------------------------------


@register(
    "x3_validation_rules",
    oracle="""
    SELECT doc_id,
           (CASE WHEN n_chars > 60 THEN 0 ELSE 1 END)
           + (CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS n_violations
    FROM documents
    """,
)
def x3_validation_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map documents into DC-ish field maps with synthetic presence/URL
    defects, run the compiled rule predicates, count violations per record —
    the validation compiler under oracle check."""
    from tulflow_spark.validation.rules import Rule, violations_column

    rules = [
        Rule("R1", "required", "dcterms:title", "no title"),
        Rule("T1", "non_empty", "dcterms:title", "empty title"),
        Rule("U1", "starts_with", "edm:isShownAt", "bad url", arg="http"),
    ]
    d = table(spark, sf_dir, "documents")
    empty = F.array().cast("array<string>")
    fields = F.map_from_arrays(
        F.array(F.lit("dcterms:title"), F.lit("edm:isShownAt")),
        F.array(
            F.when(F.col("n_chars") > 60, F.array(F.col("text"))).otherwise(empty),
            F.array(
                F.when(
                    F.col("doc_id") % 2 == 0,
                    F.concat(F.lit("http://host/"), F.col("doc_id").cast("string")),
                ).otherwise(
                    F.concat(F.lit("ftp://host/"), F.col("doc_id").cast("string"))
                )
            ),
        ),
    )
    return d.select(
        "doc_id",
        F.size(violations_column(rules, fields)).alias("n_violations"),
    )


@register(
    "x2b_marc_native",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS record_id,
           o_orderpriority AS priority
    FROM orders
    """,
)
def x2b_marc_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same round-trip as x2, through the JVM-native from_xml parser — the
    bulk-ingest hot path (zero Python; compare timings against x2 in bench
    output)."""
    from tulflow_spark.io import widen
    from tulflow_spark.model.xml_native import parse_marc_native
    from tulflow_spark.operators.marc import record_001, subfield_values

    # XML build+parse is the expensive map stage; widen past the
    # single-row-group scan so it runs at cluster width (no-op at scale)
    o = widen(table(spark, sf_dir, "orders"))
    xml = F.concat(
        F.lit('<record xmlns="http://www.loc.gov/MARC21/slim">'
              '<controlfield tag="001">'),
        F.col("o_orderkey").cast("string"),
        F.lit('</controlfield><datafield tag="900" ind1=" " ind2=" ">'
              '<subfield code="a">'),
        F.col("o_orderpriority"),
        F.lit("</subfield></datafield></record>"),
    )
    marc = o.withColumn("marc", parse_marc_native(xml))
    return marc.select(
        record_001(F.col("marc")).alias("record_id"),
        F.get(subfield_values(F.col("marc"), "900", "a"), 0).alias("priority"),
    )


@register(
    "x4_transform_rules",
    oracle="""
    SELECT doc_id,
           CASE WHEN regexp_matches(lower(trim(text)), '^the')
                THEN 'Leading Article' END AS doc_class,
           CASE WHEN NOT regexp_matches(lower(trim(text)), '^the')
                THEN trim(regexp_replace(text, '\\s+', ' ', 'g')) END AS doc_text
    FROM documents
    WHERE lang <> 'zh'
    """,
)
def x4_transform_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The XSLT-subset transform compiler under oracle check: documents →
    DC-ish maps → compiled stylesheet semantics (record filter + regex
    vocabulary dispatch with otherwise-routing + normalize-space)."""
    from tulflow_spark.transform.rules import (
        CompiledStylesheet,
        FieldTemplate,
        RecordFilter,
        ValueCase,
        apply_templates,
        record_keep_predicate,
    )

    sheet = CompiledStylesheet(
        templates=(
            FieldTemplate(
                match_field="dc:text",
                cases=(
                    ValueCase(out_field="doc_class", pattern="^the",
                              out_value="Leading Article"),
                    ValueCase(out_field="doc_text"),  # otherwise: normalized text
                ),
            ),
        ),
        record_filters=(RecordFilter("dc:lang", "zh"),),
    )
    d = table(spark, sf_dir, "documents")
    fields = F.map_from_arrays(
        F.array(F.lit("dc:text"), F.lit("dc:lang")),
        F.array(F.array(F.col("text")), F.array(F.col("lang"))),
    )
    kept = d.withColumn("_f", fields).filter(
        record_keep_predicate(sheet, F.col("_f"))
    )
    out = kept.withColumn("_out", apply_templates(sheet, F.col("_f")))
    return out.select(
        "doc_id",
        F.get(F.element_at(F.col("_out"), F.lit("doc_class")), 0).alias("doc_class"),
        F.get(F.element_at(F.col("_out"), F.lit("doc_text")), 0).alias("doc_text"),
    )


_X5_XSL = """<?xml version="1.0" encoding="UTF-8"?>
<xsl:stylesheet xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmlns:dcterms="http://purl.org/dc/terms/"
    xmlns:edm="http://www.europeana.eu/schemas/edm/"
    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
    xmlns:oai="http://www.openarchives.org/OAI/2.0/"
    version="2.0">
  <xsl:template match="text() | @*"/>
  <xsl:template match="//oai_dc:dc[not(dc:relation[string()= 'skip'])]">
    <oai_dc:dc
        xmlns:dc="http://purl.org/dc/elements/1.1/"
        xmlns:dcterms="http://purl.org/dc/terms/"
        xmlns:edm="http://www.europeana.eu/schemas/edm/"
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
      <xsl:when test="starts-with(., 'https://creativecommons.org/')">
        <xsl:element name="edm:rights">
          <xsl:value-of select="."/>
        </xsl:element>
      </xsl:when>
      <xsl:otherwise>
        <xsl:element name="dcterms:rights">
          <xsl:value-of select="."/>
        </xsl:element>
      </xsl:otherwise>
    </xsl:choose>
  </xsl:template>
  <xsl:template match="dc:subject">
    <xsl:call-template name="subj_template">
      <xsl:with-param name="stringz" select="."/>
      <xsl:with-param name="delimiter" select="';'"/>
    </xsl:call-template>
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


@register(
    "x5_byte_serialize",
    oracle="""
    SELECT n_nationkey AS nation_key,
           '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
           || '<oai_dc:dc xmlns:dc="http://purl.org/dc/elements/1.1/"'
           || ' xmlns:dcterms="http://purl.org/dc/terms/"'
           || ' xmlns:edm="http://www.europeana.eu/schemas/edm/"'
           || ' xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"'
           || ' xmlns:oai="http://www.openarchives.org/OAI/2.0/">'
           || '<dcterms:title>' || n_name || '</dcterms:title>'
           || CASE WHEN n_nationkey % 2 = 0
                   THEN '<edm:rights>https://creativecommons.org/pd/'
                        || n_name || '</edm:rights>'
                   ELSE '<dcterms:rights>All rights held by ' || n_name
                        || '</dcterms:rights>' END
           || '<dcterms:subject>' || n_name || '</dcterms:subject>'
           || '<dcterms:subject> middle topic </dcterms:subject>'
           || '<dcterms:subject>tail topic</dcterms:subject>'
           || '<edm:provider>PA Digital</edm:provider>'
           || '</oai_dc:dc>' || chr(10) AS xml
    FROM nation
    WHERE n_regionkey <> 0
    """,
)
def x5_byte_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-golden serialization under oracle check: the widened XSLT subset
    (starts-with dispatch, delimiter-split named template, hub constant,
    record marker filter) plus the Saxon output layout (namespace order,
    input-document element order, trailing constants) reproduced as one
    whole-stage-codegen string expression — the DuckDB oracle rebuilds the
    EXACT bytes with SQL concatenation.  Parity target: the reference's
    byte-equality assertions (tests/test_transform.py:114-121)."""
    from tulflow_spark.transform.serialize import transform_to_xml

    n = table(spark, sf_dir, "nation")
    fields = F.map_from_arrays(
        F.array(
            F.lit("dc:title"), F.lit("dc:rights"),
            F.lit("dc:subject"), F.lit("dc:relation"),
        ),
        F.array(
            F.array(F.concat(F.lit("  "), F.col("n_name"), F.lit("  "))),
            F.array(
                F.when(
                    F.col("n_nationkey") % 2 == 0,
                    F.concat(
                        F.lit("https://creativecommons.org/pd/"),
                        F.col("n_name"),
                    ),
                ).otherwise(
                    F.concat(
                        F.lit("All rights held by "), F.col("n_name")
                    )
                )
            ),
            F.array(
                F.concat(F.col("n_name"), F.lit("; middle topic ;  tail topic "))
            ),
            F.array(
                F.when(F.col("n_regionkey") == 0, F.lit("skip")).otherwise(
                    F.lit("keep")
                )
            ),
        ),
    )
    src = n.select(
        F.col("n_nationkey").alias("nation_key"),
        fields.alias("fields"),
        F.array(
            F.lit("dc:title"), F.lit("dc:rights"), F.lit("dc:subject")
        ).alias("forder"),
    )
    out = transform_to_xml(
        src, _X5_XSL, order_col="forder", deleted_col=None
    )
    return out.select("nation_key", "xml")


@register(
    "x6_dynamic_xpath",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN '3'
                ELSE CAST(doc_id AS VARCHAR) END AS extracted
    FROM documents
    """,
)
def x6_dynamic_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XSLT 3.0 ``xsl:evaluate`` under oracle check (the r5 verdict's
    dynamic-evaluation wall, closed in r6): each record CARRIES the XPath
    to run in a ``rule/@path`` attribute — even ids count the record's
    children, odd ids extract the id element — and one stylesheet
    evaluates whatever arrives.  The production micro-engine runs per
    partition over Arrow batches (compiled once per executor batch
    iterator); the oracle predicts both branches analytically."""
    from collections.abc import Iterator

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id")

    xsl = """<xsl:stylesheet version="3.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:output method="text"/>
      <xsl:template match="/r">
        <xsl:evaluate xpath="rule/@path"/>
      </xsl:template>
    </xsl:stylesheet>"""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tulflow_spark.transform.microxslt import MicroXSLT

        eng = MicroXSLT(xsl)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                path = "count(/r/*)" if d % 2 == 0 else "string(/r/n)"
                xml = (
                    f"<r><rule path='{path}'/><a>w</a><n>{d}</n></r>"
                )
                out = eng(xml)
                if out.startswith("<?xml"):
                    out = out.split("?>", 1)[1].lstrip("\n")
                # count() renders as an XPath number ("3"); keep integers
                if out.endswith(".0"):
                    out = out[:-2]
                rows.append({"doc_id": d, "extracted": out})
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen, schema="doc_id bigint, extracted string")
