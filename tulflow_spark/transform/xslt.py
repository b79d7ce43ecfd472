"""XSLT (subset) → CompiledStylesheet compiler, plus the transform operator.

The reference shells out ``java -jar saxon.jar`` once PER RECORD
(transform.py:60-66) — its dominant cost.  Our strategy, in order:

1. **Compile to columns**: the stylesheet patterns its DAGs actually use
   (drop-deleted, rename-with-normalize-space, regex vocabulary dispatch,
   record marker filters) parse into :class:`CompiledStylesheet` and run as
   whole-stage-codegen column algebra — zero Python per record.
2. **Per-partition engine fallback**: arbitrary stylesheets would use one
   compiled lxml/Saxon XSLT engine per executor via ``mapInPandas``.  lxml
   is not installed in this environment, so the fallback raises
   ``UnsupportedXslt`` with a precise reason instead of degrading to a
   subprocess-per-record.

Supported template grammar (the full observed surface of the reference's
stylesheets):

- ``<xsl:template match="text() | @*"/>`` — default drop (ignored; implied)
- ``<xsl:template match="//oai:record[oai:header[@status='deleted']]/*"/>``
  — drop deleted records
- root template ``match="//oai_dc:dc[not(f[string()= 'v'])]"`` with
  ``<xsl:apply-templates/>`` — record filter on marker value
- field template ``match="dc:x"`` containing (optionally inside
  ``<xsl:if test="normalize-space(.)!=''">``):
  - ``<xsl:element name="OUT"><xsl:value-of select="normalize-space(.)|."/>
    </xsl:element>`` or a literal result element — rename/passthrough
  - ``<xsl:choose>`` of ``<xsl:when test="matches(., 'RE', 'i')">`` with a
    constant literal element, plus ``<xsl:otherwise>`` — vocabulary dispatch
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tulflow_spark.transform.rules import (
    CompiledStylesheet,
    FieldTemplate,
    RecordFilter,
    ValueCase,
    apply_templates,
    record_keep_predicate,
)

XSL_NS = "http://www.w3.org/1999/XSL/Transform"

# namespace-uri → canonical prefix for literal result elements
PREFIXES = {
    "http://purl.org/dc/elements/1.1/": "dc",
    "http://purl.org/dc/terms/": "dcterms",
    "http://www.europeana.eu/schemas/edm/": "edm",
    "http://www.openarchives.org/OAI/2.0/": "oai",
    "http://www.openarchives.org/OAI/2.0/oai_dc/": "oai_dc",
}


class UnsupportedXslt(ValueError):
    """Stylesheet uses constructs outside the compilable subset (and no
    per-partition XSLT engine is available in this environment)."""


class EngineUnavailable(RuntimeError):
    """No XSLT/Schematron engine importable in this environment — the typed
    skip for the arbitrary-stylesheet fallback path."""


def default_xslt_engine_factory(stylesheet_text: str):
    """lxml-backed engine factory: ``factory(stylesheet) -> fn(xml) -> xml``.

    Called once per PARTITION by :func:`transform_xml_with_engine` (one
    compiled transform reused across all rows — never a subprocess, never
    per-record compilation).  Raises :class:`EngineUnavailable` when lxml is
    absent, so callers fail fast with a typed reason instead of degrading.
    """
    try:
        from lxml import etree
    except ImportError as exc:  # pragma: no cover - lxml absent here
        raise EngineUnavailable(
            "arbitrary-XSLT fallback needs lxml (or a custom engine_factory);"
            " not installed in this environment"
        ) from exc
    transform = etree.XSLT(etree.fromstring(stylesheet_text.encode("utf-8")))

    def fn(xml: str) -> str:
        return str(transform(etree.fromstring(xml.encode("utf-8"))))

    return fn


def transform_xml_with_engine(
    df: DataFrame,
    stylesheet: str | bytes,
    engine_factory=default_xslt_engine_factory,
    xml_col: str = "metadata_xml",
):
    """Arbitrary-stylesheet transform: one engine instance per partition
    (iterator pandas UDF), applied row-wise to the raw record XML.

    This is the reference's general path (transform.py:39-66, any Saxon
    stylesheet) re-expressed without the per-record JVM fork: the engine is
    injected (``engine_factory``), compiled once per partition, and rows
    whose transform fails or returns empty become NULL (dropped records /
    parse failures route to the deleted side downstream).

    The factory is probed once on the driver at plan-build time so a
    missing engine raises :class:`EngineUnavailable` immediately, not as an
    executor-side task failure mid-job.
    """
    text = stylesheet.decode("utf-8") if isinstance(stylesheet, bytes) else stylesheet
    engine_factory(text)  # driver-side probe: typed failure, fail-fast

    @pandas_udf("string")
    def run(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        fn = engine_factory(text)  # once per partition, reused per row
        for s in batches:
            out = []
            for xml in s:
                if xml is None:
                    out.append(None)
                    continue
                try:
                    res = fn(xml)
                    out.append(res if res and res.strip() else None)
                except Exception:
                    out.append(None)
            yield pd.Series(out, dtype="object")

    return df.withColumn(xml_col, run(F.col(xml_col)))


def _xsl(tag: str) -> str:
    return f"{{{XSL_NS}}}{tag}"


def _qname(el: ET.Element) -> str:
    m = re.match(r"^\{([^}]*)\}(.+)$", el.tag)
    if not m:
        return el.tag
    ns, local = m.groups()
    prefix = PREFIXES.get(ns)
    return f"{prefix}:{local}" if prefix else local


_DELETED_MATCH_RE = re.compile(r"oai:header\[@status='deleted'\]")
_FIELD_MATCH_RE = re.compile(r"^[\w.-]+:[\w.-]+$")
_ROOT_FILTER_RE = re.compile(
    r"^//?[\w.-]+:[\w.-]+\[not\(([\w.-]+:[\w.-]+)\[string\(\)\s*=\s*'([^']*)'\]\)\]$"
)
_MATCHES_TEST_RE = re.compile(
    r"^matches\(\s*\.\s*,\s*'([^']*)'\s*(?:,\s*'i'\s*)?\)$"
)
_NONEMPTY_IF_RE = re.compile(r"^normalize-space\(\.\)\s*!=\s*''$")


def _literal_case(el: ET.Element) -> ValueCase:
    """A literal result element: constant text → constant case; a value-of
    child → passthrough case."""
    out_field = _qname(el)
    value_of = el.find(_xsl("value-of"))
    if value_of is not None:
        select = (value_of.get("select") or "").strip()
        if select == "normalize-space(.)":
            return ValueCase(out_field=out_field, normalize=True)
        if select == ".":
            return ValueCase(out_field=out_field, normalize=False)
        raise UnsupportedXslt(f"value-of select not in subset: {select!r}")
    text = (el.text or "").strip()
    return ValueCase(out_field=out_field, out_value=text)


def _element_case(el: ET.Element) -> ValueCase:
    """``<xsl:element name="OUT">`` wrapper around a value-of."""
    name = el.get("name") or ""
    value_of = el.find(_xsl("value-of"))
    if value_of is None:
        raise UnsupportedXslt("xsl:element without value-of")
    select = (value_of.get("select") or "").strip()
    if select == "normalize-space(.)":
        return ValueCase(out_field=name, normalize=True)
    if select == ".":
        return ValueCase(out_field=name, normalize=False)
    raise UnsupportedXslt(f"value-of select not in subset: {select!r}")


def _body_cases(parent: ET.Element) -> list[ValueCase]:
    cases: list[ValueCase] = []
    for child in parent:
        if child.tag == _xsl("element"):
            cases.append(_element_case(child))
        elif child.tag == _xsl("choose"):
            for when in child.findall(_xsl("when")):
                test = (when.get("test") or "").strip()
                m = _MATCHES_TEST_RE.match(test)
                if not m:
                    raise UnsupportedXslt(f"when test not in subset: {test!r}")
                lits = [c for c in when if not c.tag.startswith(f"{{{XSL_NS}}}")]
                if len(lits) != 1:
                    raise UnsupportedXslt("when must contain one literal element")
                base = _literal_case(lits[0])
                cases.append(
                    ValueCase(
                        out_field=base.out_field,
                        pattern=m.group(1),
                        out_value=base.out_value,
                        normalize=base.normalize,
                    )
                )
            other = child.find(_xsl("otherwise"))
            if other is not None:
                lits = [c for c in other if not c.tag.startswith(f"{{{XSL_NS}}}")]
                if len(lits) != 1:
                    raise UnsupportedXslt("otherwise must contain one literal element")
                cases.append(_literal_case(lits[0]))
        elif not child.tag.startswith(f"{{{XSL_NS}}}"):
            cases.append(_literal_case(child))
        else:
            raise UnsupportedXslt(f"template body element not in subset: {child.tag}")
    return cases


def compile_xslt(doc: str | bytes) -> CompiledStylesheet:
    text = doc.decode("utf-8") if isinstance(doc, bytes) else doc
    root = ET.fromstring(text)
    templates: list[FieldTemplate] = []
    drop_deleted = False
    record_filters: list[RecordFilter] = []
    for tpl in root.findall(_xsl("template")):
        match = (tpl.get("match") or "").strip()
        body = list(tpl)
        if not match:
            raise UnsupportedXslt("template without match")
        if match == "text() | @*" or match == "text()|@*":
            continue  # default-drop template (implied by our model)
        if _DELETED_MATCH_RE.search(match) and not body:
            drop_deleted = True
            continue
        m_root = _ROOT_FILTER_RE.match(match)
        if m_root:
            # root record template; body must be apply-templates (+ literal wrapper)
            record_filters.append(
                RecordFilter(exclude_field=m_root.group(1), exclude_value=m_root.group(2))
            )
            continue
        if _FIELD_MATCH_RE.match(match):
            require_non_empty = False
            case_parent: ET.Element = tpl
            if_el = tpl.find(_xsl("if"))
            if if_el is not None:
                test = (if_el.get("test") or "").strip()
                if not _NONEMPTY_IF_RE.match(test):
                    raise UnsupportedXslt(f"if test not in subset: {test!r}")
                require_non_empty = True
                case_parent = if_el
            cases = _body_cases(case_parent)
            if not cases:
                continue  # empty template = drop this field
            templates.append(
                FieldTemplate(
                    match_field=match,
                    cases=tuple(cases),
                    require_non_empty=require_non_empty,
                )
            )
            continue
        raise UnsupportedXslt(f"template match not in subset: {match!r}")
    return CompiledStylesheet(
        templates=tuple(templates),
        drop_deleted=drop_deleted,
        record_filters=tuple(record_filters),
    )


def transform_records(
    df: DataFrame,
    stylesheet: str | bytes | CompiledStylesheet,
    fields_col: str = "fields",
    deleted_col: str | None = "deleted",
) -> DataFrame:
    """Apply a (compiled) stylesheet to a record stream: record-level drops,
    then field mapping — one map-only pass, no Python per record."""
    sheet = (
        stylesheet
        if isinstance(stylesheet, CompiledStylesheet)
        else compile_xslt(stylesheet)
    )
    deleted = F.col(deleted_col) if deleted_col and deleted_col in df.columns else None
    kept = df.filter(record_keep_predicate(sheet, F.col(fields_col), deleted))
    return kept.withColumn(fields_col, apply_templates(sheet, F.col(fields_col)))
