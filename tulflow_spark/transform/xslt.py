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
  ``<xsl:apply-templates/>`` — record filter on marker value — plus
  ``<xsl:call-template name="hub"/>`` calls to constant named templates
  (each adds one constant output field per kept record)
- field template ``match="dc:x"`` containing (optionally inside
  ``<xsl:if test="normalize-space(.)!=''">``):
  - ``<xsl:element name="OUT"><xsl:value-of select="normalize-space(.)|."/>
    </xsl:element>`` or a literal result element — rename/passthrough;
    either may carry constant literal attributes or constant
    ``<xsl:attribute>`` constructors (recorded in the IR for serializers)
  - ``<xsl:copy-of select=".|node()"/>`` — passthrough under the matched name
  - ``<xsl:choose>`` of ``<xsl:when test="matches(., 'RE', 'i')">`` or
    ``<xsl:when test="starts-with(., 'p') [or starts-with(., 'q')]*">``,
    each branch a literal/element (optionally inside a branch-level
    non-empty ``xsl:if``), plus ``<xsl:otherwise>`` — vocabulary dispatch
    and the rights URI-vs-text split (temple.xsl)
  - a single ``<xsl:call-template>`` of a recursive delimiter-split named
    template with params ``(., 'delim')`` (subj_template) — the value is
    split on the delimiter, intermediate pieces raw, final piece
    normalize-spaced, one output element per piece
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
    """Engine factory: ``factory(stylesheet) -> fn(xml) -> xml``.

    Called once per PARTITION by :func:`transform_xml_with_engine` (one
    compiled transform reused across all rows — never a subprocess, never
    per-record compilation).  Prefers lxml's XSLT when importable; otherwise
    compiles the stylesheet with the stdlib-only micro-interpreter
    (:class:`tulflow_spark.transform.microxslt.MicroXSLT`), which covers the
    XSLT 1.0 instruction set the reference corpus uses and is golden-output
    verified against the reference's Saxon results
    (tests/fixtures/xsl-sample-*-output-record*.xml).  A stylesheet outside
    BOTH engines' surface raises a typed error at driver-side probe time.
    """
    try:
        from lxml import etree
    except ImportError:
        from tulflow_spark.transform.microxslt import MicroXSLT

        return MicroXSLT(stylesheet_text)
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
# starts-with(., 'p') [or starts-with(., 'q')]* — the rights-URI dispatch
_STARTS_WITH_RE = re.compile(r"^starts-with\(\s*\.\s*,\s*'([^']*)'\s*\)$")


def _prefixes_test(test: str) -> tuple[str, ...] | None:
    parts = re.split(r"\s+or\s+", test.strip())
    out = []
    for part in parts:
        m = _STARTS_WITH_RE.match(part.strip())
        if not m:
            return None
        out.append(m.group(1))
    return tuple(out)


def _constant_attrs(
    el: ET.Element, literal: bool = True
) -> tuple[tuple[str, str], ...]:
    """Literal attributes on the result element plus constant
    ``<xsl:attribute name="n">text</xsl:attribute>`` constructors.  xmlns
    declarations never appear here (ElementTree hoists them out of attrib);
    ``literal=False`` skips ``el.attrib`` entirely (an ``xsl:element``'s own
    attributes — name/namespace — are instructions, not output)."""
    attrs = (
        [(_attr_qname(k), v) for k, v in sorted(el.attrib.items())]
        if literal
        else []
    )
    for child in el.findall(_xsl("attribute")):
        name = (child.get("name") or "").strip()
        if not name:
            raise UnsupportedXslt("xsl:attribute without name")
        if len(child) > 0:
            raise UnsupportedXslt(
                "xsl:attribute with computed content not in subset"
            )
        attrs.append((name, (child.text or "").strip()))
    return tuple(attrs)


def _attr_qname(name: str) -> str:
    m = re.match(r"^\{([^}]*)\}(.+)$", name)
    if not m:
        return name
    ns, local = m.groups()
    prefix = PREFIXES.get(ns)
    return f"{prefix}:{local}" if prefix else local


def _literal_case(el: ET.Element) -> ValueCase:
    """A literal result element: constant text → constant case; a value-of
    child → passthrough case."""
    out_field = _qname(el)
    attrs = _constant_attrs(el)
    value_of = el.find(_xsl("value-of"))
    if value_of is not None:
        select = (value_of.get("select") or "").strip()
        if select == "normalize-space(.)":
            return ValueCase(out_field=out_field, normalize=True, attrs=attrs)
        if select in (".", "node()"):
            return ValueCase(out_field=out_field, normalize=False, attrs=attrs)
        raise UnsupportedXslt(f"value-of select not in subset: {select!r}")
    copy_of = el.find(_xsl("copy-of"))
    if copy_of is not None:
        select = (copy_of.get("select") or "").strip()
        if select in (".", "node()", "text()"):
            return ValueCase(out_field=out_field, normalize=False, attrs=attrs)
        raise UnsupportedXslt(f"copy-of select not in subset: {select!r}")
    text = (el.text or "").strip()
    return ValueCase(out_field=out_field, out_value=text, attrs=attrs)


def _element_case(el: ET.Element) -> ValueCase:
    """``<xsl:element name="OUT">`` wrapper around a value-of / copy-of."""
    name = el.get("name") or ""
    attrs = _constant_attrs(el, literal=False)
    value_of = el.find(_xsl("value-of"))
    if value_of is not None:
        select = (value_of.get("select") or "").strip()
        if select == "normalize-space(.)":
            return ValueCase(out_field=name, normalize=True, attrs=attrs)
        if select in (".", "node()"):
            return ValueCase(out_field=name, normalize=False, attrs=attrs)
        if select == "" and not len(value_of):
            # <xsl:value-of>constant text</xsl:value-of> (hub idiom)
            return ValueCase(
                out_field=name, out_value=(value_of.text or "").strip(),
                attrs=attrs,
            )
        raise UnsupportedXslt(f"value-of select not in subset: {select!r}")
    copy_of = el.find(_xsl("copy-of"))
    if copy_of is not None:
        select = (copy_of.get("select") or "").strip()
        if select in (".", "node()", "text()"):
            return ValueCase(out_field=name, normalize=False, attrs=attrs)
        raise UnsupportedXslt(f"copy-of select not in subset: {select!r}")
    raise UnsupportedXslt("xsl:element without value-of/copy-of")


def _branch_case(parent: ET.Element, skip_empty: bool = False) -> ValueCase:
    """The single output construct of a choose branch, optionally wrapped in
    a branch-level non-empty guard (temple.xsl's dc:rights shape)."""
    children = list(parent)
    if len(children) != 1:
        raise UnsupportedXslt("choose branch must contain one element")
    el = children[0]
    if el.tag == _xsl("if"):
        test = (el.get("test") or "").strip()
        if not _NONEMPTY_IF_RE.match(test):
            raise UnsupportedXslt(f"if test not in subset: {test!r}")
        return _branch_case(el, skip_empty=True)
    if el.tag == _xsl("element"):
        base = _element_case(el)
    elif not el.tag.startswith(f"{{{XSL_NS}}}"):
        base = _literal_case(el)
    else:
        raise UnsupportedXslt(f"choose branch element not in subset: {el.tag}")
    return (
        ValueCase(
            out_field=base.out_field, out_value=base.out_value,
            normalize=base.normalize, attrs=base.attrs, skip_empty=True,
        )
        if skip_empty
        else base
    )


def _body_cases(parent: ET.Element, match: str | None = None) -> list[ValueCase]:
    cases: list[ValueCase] = []
    for child in parent:
        if child.tag == _xsl("element"):
            cases.append(_element_case(child))
        elif child.tag == _xsl("copy-of"):
            # bare copy-of of the matched node: passthrough under the same
            # output element name
            select = (child.get("select") or "").strip()
            if select not in (".", "node()") or match is None:
                raise UnsupportedXslt(f"copy-of select not in subset: {select!r}")
            cases.append(ValueCase(out_field=match, normalize=False))
        elif child.tag == _xsl("choose"):
            for when in child.findall(_xsl("when")):
                test = (when.get("test") or "").strip()
                m = _MATCHES_TEST_RE.match(test)
                prefixes = None if m else _prefixes_test(test)
                if not m and prefixes is None:
                    raise UnsupportedXslt(f"when test not in subset: {test!r}")
                base = _branch_case(when)
                cases.append(
                    ValueCase(
                        out_field=base.out_field,
                        pattern=m.group(1) if m else None,
                        prefixes=prefixes,
                        out_value=base.out_value,
                        normalize=base.normalize,
                        skip_empty=base.skip_empty,
                        attrs=base.attrs,
                    )
                )
            other = child.find(_xsl("otherwise"))
            if other is not None:
                cases.append(_branch_case(other))
        elif not child.tag.startswith(f"{{{XSL_NS}}}"):
            cases.append(_literal_case(child))
        else:
            raise UnsupportedXslt(f"template body element not in subset: {child.tag}")
    return cases


_CONTAINS_TEST_RE = re.compile(
    r"^contains\(\s*\$([\w-]+)\s*,\s*\$([\w-]+)\s*\)$"
)
_SUBSTR_BEFORE_RE = re.compile(
    r"^substring-before\(\s*\$([\w-]+)\s*,\s*\$([\w-]+)\s*\)$"
)
_NORM_PARAM_RE = re.compile(r"^normalize-space\(\s*\$([\w-]+)\s*\)$")
_LITERAL_PARAM_RE = re.compile(r"^'([^']*)'$")


def _named_template(tpl: ET.Element, name: str):
    """Classify a named template: ('const', field, value) for the constant
    hub idiom, ('split', field) for the recursive delimiter-split idiom
    (subj_template — the delimiter arrives from the call site), else None."""
    body = [c for c in tpl if c.tag != _xsl("param")]
    params = [c.get("name") for c in tpl.findall(_xsl("param"))]
    if not params and len(body) == 1:
        try:
            case = (
                _element_case(body[0])
                if body[0].tag == _xsl("element")
                else _literal_case(body[0])
            )
        except UnsupportedXslt:
            return None
        if case.out_value is not None:
            return ("const", case.out_field, case.out_value)
        return None
    if len(params) == 2 and len(body) == 1 and body[0].tag == _xsl("choose"):
        choose = body[0]
        whens = choose.findall(_xsl("when"))
        other = choose.find(_xsl("otherwise"))
        if len(whens) != 1 or other is None:
            return None
        when = whens[0]
        if not _CONTAINS_TEST_RE.match((when.get("test") or "").strip()):
            return None
        lits = [c for c in when if not c.tag.startswith(f"{{{XSL_NS}}}")]
        recur = when.findall(_xsl("call-template"))
        if len(lits) != 1 or len(recur) != 1 or recur[0].get("name") != name:
            return None
        head_vo = lits[0].find(_xsl("value-of"))
        if head_vo is None or not _SUBSTR_BEFORE_RE.match(
            (head_vo.get("select") or "").strip()
        ):
            return None
        olits = [c for c in other if not c.tag.startswith(f"{{{XSL_NS}}}")]
        if len(olits) != 1:
            return None
        tail_vo = olits[0].find(_xsl("value-of"))
        if tail_vo is None or not _NORM_PARAM_RE.match(
            (tail_vo.get("select") or "").strip()
        ):
            return None
        head_field, tail_field = _qname(lits[0]), _qname(olits[0])
        if head_field != tail_field:
            return None
        return ("split", head_field)
    return None


def _call_template_split(
    call: ET.Element, named: dict[str, tuple]
) -> tuple[str, str] | None:
    """A field template delegating to a split named template:
    call-template with with-params (., 'delim') → (out_field, delimiter)."""
    kind = named.get(call.get("name") or "")
    if not kind or kind[0] != "split":
        return None
    delim = None
    for wp in call.findall(_xsl("with-param")):
        sel = (wp.get("select") or "").strip()
        m = _LITERAL_PARAM_RE.match(sel)
        if m:
            delim = m.group(1)
        elif sel != ".":
            return None
    return (kind[1], delim) if delim else None


def compile_xslt(
    doc: str | bytes, includes: tuple[str | bytes, ...] = ()
) -> CompiledStylesheet:
    """Compile a stylesheet (plus the texts of its ``xsl:include``/
    ``xsl:import`` dependencies — the reference's DAGs load the shared
    funcake transform alongside the collection file, transform.py:39-49).
    Included field templates merge in with the MAIN document winning on a
    match conflict; included named templates resolve call sites in the main
    document (``hub`` lives in temple.xsl, called from the collection
    root template)."""
    def _parse(d: str | bytes) -> ET.Element:
        return ET.fromstring(d.decode("utf-8") if isinstance(d, bytes) else d)

    root = _parse(doc)
    inc_roots = [_parse(i) for i in includes]
    hrefs = [
        el.get("href")
        for el in (*root.findall(_xsl("include")), *root.findall(_xsl("import")))
    ]
    templates: list[FieldTemplate] = []
    drop_deleted = False
    record_filters: list[RecordFilter] = []
    constants: list[tuple[str, str]] = []
    # pass 1 over ALL documents: named templates (may be defined after
    # their call sites, or in an included document); main wins on conflict
    named: dict[str, tuple] = {}
    for r in [*inc_roots, root]:
        for tpl in r.findall(_xsl("template")):
            name = (tpl.get("name") or "").strip()
            if not name:
                continue
            kind = _named_template(tpl, name)
            if kind is None:
                raise UnsupportedXslt(f"named template not in subset: {name!r}")
            named[name] = kind
    # pass 2: match templates, includes first so the main document
    # overrides an included template with the same match
    by_match: dict[str, ET.Element] = {}
    ordered: list[ET.Element] = []
    for r in [*inc_roots, root]:
        for tpl in r.findall(_xsl("template")):
            if tpl.get("name"):
                continue
            match = (tpl.get("match") or "").strip()
            if match in by_match:
                ordered[ordered.index(by_match[match])] = tpl
            else:
                ordered.append(tpl)
            by_match[match] = tpl
    for tpl in ordered:
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
            # root record template: apply-templates (inside an optional
            # literal wrapper) plus constant named-template calls (hub)
            record_filters.append(
                RecordFilter(exclude_field=m_root.group(1), exclude_value=m_root.group(2))
            )
            for call in tpl.iter(_xsl("call-template")):
                kind = named.get(call.get("name") or "")
                if kind is None or kind[0] != "const":
                    hint = (
                        f" (unresolved xsl:include/import: {hrefs!r} — pass"
                        f" their text via includes=)" if hrefs else ""
                    )
                    raise UnsupportedXslt(
                        f"root call-template not a constant named template:"
                        f" {call.get('name')!r}{hint}"
                    )
                constants.append((kind[1], kind[2]))
            continue
        if _FIELD_MATCH_RE.match(match):
            # delegation to a recursive delimiter-split named template
            # (<xsl:template match="dc:subject"><xsl:call-template
            #  name="subj_template"> with (., ';'))
            calls = [c for c in body if c.tag == _xsl("call-template")]
            if len(body) == 1 and len(calls) == 1:
                split = _call_template_split(calls[0], named)
                if split is None:
                    raise UnsupportedXslt(
                        f"call-template not in subset: {calls[0].get('name')!r}"
                    )
                out_field, delim = split
                templates.append(
                    FieldTemplate(
                        match_field=match,
                        cases=(ValueCase(out_field=out_field, normalize=False),),
                        require_non_empty=False,
                        split_delimiter=delim,
                    )
                )
                continue
            require_non_empty = False
            case_parent: ET.Element = tpl
            if_el = tpl.find(_xsl("if"))
            if if_el is not None:
                test = (if_el.get("test") or "").strip()
                if not _NONEMPTY_IF_RE.match(test):
                    raise UnsupportedXslt(f"if test not in subset: {test!r}")
                require_non_empty = True
                case_parent = if_el
            cases = _body_cases(case_parent, match=match)
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
        constants=tuple(constants),
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
