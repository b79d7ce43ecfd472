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

Anything else raises ``UnsupportedSchematron`` — fail fast rather than
validate wrongly.  (A generic XSLT-based Schematron engine would need lxml,
which is unavailable here; the subset covers the reference's entire observed
rule surface.)
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
    """lxml-isoschematron engine factory:
    ``factory(schema) -> fn(xml) -> list[failed-assert messages]``.

    Called once per partition by :func:`validate_xml_with_engine` (compiled
    schema reused across rows — the reference compiles once per process,
    validate.py:35-42).  Raises
    :class:`~tulflow_spark.transform.xslt.EngineUnavailable` when lxml is
    absent — a typed skip, not a silent wrong answer.
    """
    try:
        from lxml import etree, isoschematron
    except ImportError as exc:  # pragma: no cover - lxml absent here
        from tulflow_spark.transform.xslt import EngineUnavailable

        raise EngineUnavailable(
            "arbitrary-Schematron fallback needs lxml (or a custom"
            " engine_factory); not installed in this environment"
        ) from exc
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
