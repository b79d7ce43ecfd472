"""ISO-Schematron (subset) → Rule list.

Parses the schema grammar the reference consumes (``<pattern>/<rule
context>/<assert test>`` with ``<ns>`` prefix declarations — the exact shape
of its rule sets, e.g. tests/fixtures/sch-sample.sch in the reference repo)
and compiles each assert's XPath test into a declarative
:class:`~tulflow_spark.validation.rules.Rule`.

Supported test grammar (everything the reference's rule sets use):

- ``prefix:field``                          → required
- ``a or b``                                → required with alternative
- ``normalize-space(.)`` / ``... != ''``    → non_empty (field context)
- ``starts-with(normalize-space(.), 'x')``
  / ``starts-with(., 'x')``                 → starts_with (field context)

Anything else raises ``UnsupportedSchematron`` from the column compiler —
but no longer hits a wall: :func:`validate_xml_with_engine` falls back to
:func:`micro_schematron_engine`, a generic engine that evaluates ARBITRARY
XPath 1.0 assert tests via the stdlib-only evaluator in
:mod:`tulflow_spark.transform.xpath1` (no lxml required).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd

from tulflow_spark.validation.rules import Rule

SCH_NS = "http://purl.oclc.org/dsdl/schematron"


class UnsupportedSchematron(ValueError):
    pass


def default_schematron_engine_factory(schema_text: str):
    """Engine factory: ``factory(schema) -> fn(xml) -> list[failed-assert
    messages]``.

    Called once per partition by :func:`validate_xml_with_engine` (compiled
    schema reused across rows — the reference compiles once per process,
    validate.py:35-42).  Prefers lxml-isoschematron when importable;
    otherwise compiles the schema with the stdlib-only micro-engine
    (:func:`micro_schematron_engine`), which evaluates arbitrary XPath 1.0
    assert tests — not just the column-compiled subset — via
    :mod:`tulflow_spark.transform.xpath1`.
    """
    try:
        from lxml import etree, isoschematron
    except ImportError:
        return micro_schematron_engine(schema_text)
    schema = isoschematron.Schematron(
        etree.fromstring(schema_text.encode("utf-8")), store_report=True
    )
    svrl_ns = {"svrl": "http://purl.oclc.org/dsdl/svrl"}

    def fn(xml: str) -> list[str]:
        if schema.validate(etree.fromstring(xml.encode("utf-8"))):
            return []
        return [
            t.strip()
            for t in schema.validation_report.xpath(
                "//svrl:failed-assert/svrl:text/text()", namespaces=svrl_ns
            )
        ]

    return fn


def validate_xml_with_engine(
    df,
    schema: str | bytes,
    engine_factory=default_schematron_engine_factory,
    xml_col: str = "metadata_xml",
    out_col: str = "violations",
):
    """Arbitrary-Schematron validation: one compiled engine per partition
    (iterator pandas UDF) producing the same ``violations ARRAY<STRING>``
    column the subset compiler produces — so the filter/report split and the
    all-filtered guard downstream are identical for both paths.

    Unparseable records yield a single synthetic violation (they must route
    to the invalid report, mirroring the reference where a parse failure
    fails validation).  The factory is probed driver-side for a typed
    fail-fast when no engine is available.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    text = schema.decode("utf-8") if isinstance(schema, bytes) else schema
    engine_factory(text)  # driver-side probe

    @pandas_udf("array<string>")
    def run(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        fn = engine_factory(text)
        for s in batches:
            out = []
            for xml in s:
                if xml is None:
                    out.append(["record has no metadata"])
                    continue
                try:
                    out.append(fn(xml))
                except Exception as exc:
                    out.append([f"validation error: {str(exc)[:200]}"])
            yield pd.Series(out, dtype="object")

    return df.withColumn(out_col, run(F.col(xml_col)))


def micro_schematron_engine(schema_text: str):
    """Generic ISO-Schematron engine over the stdlib XPath 1.0 evaluator:
    ``fn(xml) -> list[failed-assert messages]`` for ARBITRARY assert tests.

    Semantics follow ISO Schematron default query binding (the subset lxml's
    isoschematron implements for the reference's usage): per pattern, each
    document node is claimed by the FIRST rule whose ``context`` pattern
    matches it; every failing ``<assert test>`` contributes its message text.
    Message order is (pattern, document-order, assert-order) — the same
    order the reference's SVRL report yields for its rule sets.
    """
    from tulflow_spark.transform.xpath1 import (
        ELEM, TEXT, Context, compile_expr, compile_pattern, parse_document,
    )

    root = parse_document(schema_text)
    schema_el = root.children[0]
    nsmap: dict[str, str] = {}
    for el in schema_el.children:
        if el.kind == ELEM and el.tag == f"{{{SCH_NS}}}ns":
            prefix = uri = None
            for a in el.attrs:
                if a.tag == "prefix":
                    prefix = a.value
                elif a.tag == "uri":
                    uri = a.value
            if prefix and uri:
                nsmap[prefix] = uri

    patterns = []
    for pat in root.children[0].children:
        if pat.kind != ELEM or pat.tag != f"{{{SCH_NS}}}pattern":
            continue
        rules = []
        for r in pat.children:
            if r.kind != ELEM or r.tag != f"{{{SCH_NS}}}rule":
                continue
            context = next(
                (a.value for a in r.attrs if a.tag == "context"), ""
            )
            asserts = []
            for a_el in r.children:
                if a_el.kind != ELEM or a_el.tag != f"{{{SCH_NS}}}assert":
                    continue
                test = next(
                    (a.value for a in a_el.attrs if a.tag == "test"), ""
                )
                message = " ".join(
                    "".join(
                        c.value or "" for c in a_el.children if c.kind == TEXT
                    ).split()
                )
                asserts.append((compile_expr(test), message))
            rules.append((compile_pattern(context), asserts))
        if rules:
            patterns.append(rules)

    def fn(xml: str) -> list[str]:
        doc = parse_document(xml)
        elems = []
        stack = list(doc.children)
        while stack:
            n = stack.pop(0)
            if n.kind == ELEM:
                elems.append(n)
                stack = n.children + stack
        out: list[str] = []
        for rules in patterns:
            for node in elems:
                ctx = Context(node, 1, 1, {}, nsmap)
                for pat, asserts in rules:
                    if pat.matches(node, ctx):
                        for test, message in asserts:
                            if not test.boolean(ctx):
                                out.append(message)
                        break  # first matching rule claims the node
        return out

    return fn


_FIELD_RE = re.compile(r"^[\w.-]+:[\w.-]+$")
_OR_RE = re.compile(r"^([\w.-]+:[\w.-]+)\s+or\s+([\w.-]+:[\w.-]+)$")
_NONEMPTY_RE = re.compile(
    r"^normalize-space\(\.\)(\s*!=\s*'')?$"
)
_STARTSWITH_RE = re.compile(
    r"^starts-with\(\s*(?:normalize-space\(\.\)|\.)\s*,\s*'([^']*)'\s*\)$"
)


def _local_field(context: str) -> str | None:
    """Last path segment when the rule context addresses a field
    (e.g. ``oai_dc:dc/dcterms:title`` → ``dcterms:title``)."""
    seg = context.rstrip("/").split("/")[-1]
    return seg if _FIELD_RE.match(seg) else None


def parse_schematron(doc: str | bytes) -> list[Rule]:
    text = doc.decode("utf-8") if isinstance(doc, bytes) else doc
    root = ET.fromstring(text)
    rules: list[Rule] = []
    counter = 0
    for pattern in root.iter(f"{{{SCH_NS}}}pattern"):
        for sch_rule in pattern.iter(f"{{{SCH_NS}}}rule"):
            context = sch_rule.get("context", "")
            is_field_ctx = "/" in context
            field_in_ctx = _local_field(context) if is_field_ctx else None
            for assert_el in sch_rule.iter(f"{{{SCH_NS}}}assert"):
                counter += 1
                test = (assert_el.get("test") or "").strip()
                message = "".join(assert_el.itertext()).strip()
                rule_id = assert_el.get("id") or f"assert{counter}"
                if not is_field_ctx:
                    m_or = _OR_RE.match(test)
                    if m_or:
                        rules.append(
                            Rule(rule_id, "required", m_or.group(1), message,
                                 alt_field=m_or.group(2))
                        )
                        continue
                    if _FIELD_RE.match(test):
                        rules.append(Rule(rule_id, "required", test, message))
                        continue
                    raise UnsupportedSchematron(
                        f"record-context test not in subset: {test!r}"
                    )
                if field_in_ctx is None:
                    raise UnsupportedSchematron(
                        f"cannot resolve field from context: {context!r}"
                    )
                if _NONEMPTY_RE.match(test):
                    rules.append(
                        Rule(rule_id, "non_empty", field_in_ctx, message)
                    )
                    continue
                m_sw = _STARTSWITH_RE.match(test)
                if m_sw:
                    rules.append(
                        Rule(rule_id, "starts_with", field_in_ctx, message,
                             arg=m_sw.group(1))
                    )
                    continue
                raise UnsupportedSchematron(
                    f"field-context test not in subset: {test!r}"
                )
    return rules
