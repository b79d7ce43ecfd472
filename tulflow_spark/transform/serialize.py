"""Byte-golden XML serialization of transformed DC records.

The reference asserts EXACT serialized bytes of each transformed record
(tests/test_transform.py:114-121 compares S3 object bytes against
``xsl-sample-*-output-record*.xml``), whose layout comes from Saxon:

- ``<?xml version="1.0" encoding="UTF-8"?>`` + newline, one-line document,
  trailing newline;
- the root element is the root template's literal result wrapper, carrying
  its namespace declarations in DECLARATION ORDER, then the stylesheet
  root's remaining in-scope declarations (document order), ``xsl`` excluded
  — Saxon copies all in-scope namespaces of the literal result element;
- child elements appear in INPUT DOCUMENT order (``xsl:apply-templates``
  walks the source tree), with constant named-template output (hub) last —
  NOT in stylesheet template order;
- text escapes ``& < >`` only (apostrophes/quotes stay literal in text).

Everything here is pure column algebra — the serialization of a corpus is
a map-only whole-stage-codegen pass, no Python per record.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tulflow_spark.transform.rules import (
    CompiledStylesheet,
    FieldTemplate,
    _case_chain,
    template_values,
)
from tulflow_spark.transform.xslt import (
    XSL_NS,
    _ROOT_FILTER_RE,
    _xsl,
)

_CONST_POS = 1 << 62  # constants (hub) sort after every input-driven entry


def wrapper_ns_decls(
    doc: str | bytes, includes: tuple[str | bytes, ...] = ()
) -> tuple[str, tuple[tuple[str, str], ...]]:
    """(root element qname, ordered namespace declarations) for the root
    template's literal result wrapper.

    Order rule (matches the Saxon output the reference pins): the wrapper's
    own declarations in document order, then the stylesheet root's
    declarations not already present, in document order; ``xsl`` excluded.
    ``includes`` are accepted for signature symmetry with ``compile_xslt``
    but the wrapper always lives in the main document.
    """
    text = doc.decode("utf-8") if isinstance(doc, bytes) else doc
    decls_by_elem: dict[int, list[tuple[str, str]]] = {}
    pending: list[tuple[str, str]] = []
    root_elem = None
    for event, payload in ET.iterparse(
        io.StringIO(text), events=("start-ns", "start")
    ):
        if event == "start-ns":
            pending.append(payload)  # (prefix, uri)
        else:
            decls_by_elem[id(payload)] = pending
            pending = []
            if root_elem is None:
                root_elem = payload
    if root_elem is None:
        raise ValueError("empty stylesheet document")
    wrapper = None
    for tpl in root_elem.findall(_xsl("template")):
        match = (tpl.get("match") or "").strip()
        if _ROOT_FILTER_RE.match(match):
            lits = [c for c in tpl if not c.tag.startswith(f"{{{XSL_NS}}}")]
            if lits:
                wrapper = lits[0]
            break
    if wrapper is None:
        raise ValueError("stylesheet has no root template with a literal wrapper")
    wrapper_decls = [
        (p, u) for p, u in decls_by_elem.get(id(wrapper), []) if u != XSL_NS
    ]
    seen = {p for p, _ in wrapper_decls}
    root_decls = [
        (p, u)
        for p, u in decls_by_elem.get(id(root_elem), [])
        if u != XSL_NS and p not in seen
    ]
    ns, local = wrapper.tag[1:].split("}", 1)
    by_uri = {u: p for p, u in [*wrapper_decls, *root_decls]}
    qname = f"{by_uri[ns]}:{local}" if ns in by_uri else local
    return qname, tuple(wrapper_decls + root_decls)


def _esc_text(c: Column) -> Column:
    """XML text escaping, & first so entities aren't double-escaped."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def ordered_entries(
    sheet: CompiledStylesheet, fields: Column, order: Column | None = None
) -> Column:
    """ARRAY<STRUCT<key, value, attrs>> of the transform output in input
    document order (first occurrence of each input field), constants last —
    the emission order of ``xsl:apply-templates`` over the source tree.

    ``order``: ARRAY<STRING> of input field keys in source-document order.
    Defaults to ``map_keys(fields)`` — correct when the map was built in
    document order JVM-side (the parse UDFs do), but map entry order does
    NOT survive every construction path (e.g. Python dict → createDataFrame
    scrambles), so callers with an explicit order column should pass it.

    Entry order: input fields by position in ``order``, each field's values
    in order, choose/case routing per value; dropped values vanish;
    constant named-template output trails.
    """
    keys = F.map_keys(fields) if order is None else order

    def _tagged(t: FieldTemplate) -> Column:
        pos = F.array_position(keys, t.match_field)
        entries = F.transform(
            template_values(t, fields), lambda v: _case_chain(t, v)
        )
        return F.transform(
            entries,
            lambda e, i: F.struct(
                pos.alias("pos"), i.alias("idx"), e.alias("entry")
            ),
        )

    const_entries = [
        F.array(
            F.struct(
                F.lit(_CONST_POS + j).alias("pos"),
                F.lit(0).alias("idx"),
                F.struct(
                    F.lit(k).alias("key"),
                    F.lit(v).alias("value"),
                    F.lit("").alias("attrs"),
                ).alias("entry"),
            )
        )
        for j, (k, v) in enumerate(sheet.constants)
    ]
    tagged = F.filter(
        F.flatten(
            F.array(*[_tagged(t) for t in sheet.templates], *const_entries)
        ),
        lambda x: x["entry"]["key"].isNotNull(),
    )
    return F.transform(F.array_sort(tagged), lambda x: x["entry"])


def serialize_record(
    entries: Column,
    root_qname: str,
    ns_decls: tuple[tuple[str, str], ...],
) -> Column:
    """One-line Saxon-layout document string from ordered entries."""
    decls = "".join(f' xmlns:{p}="{u}"' for p, u in ns_decls)
    open_tag = f"<{root_qname}{decls}>"
    body = F.array_join(
        F.transform(
            entries,
            lambda e: F.concat(
                F.lit("<"), e["key"], e["attrs"], F.lit(">"),
                _esc_text(e["value"]),
                F.lit("</"), e["key"], F.lit(">"),
            ),
        ),
        "",
    )
    return F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n' + open_tag),
        body,
        F.lit(f"</{root_qname}>\n"),
    )


def transform_to_xml(
    df: DataFrame,
    stylesheet: str | bytes,
    includes: tuple[str | bytes, ...] = (),
    fields_col: str = "fields",
    deleted_col: str | None = "deleted",
    order_col: str | None = None,
    out_col: str = "xml",
) -> DataFrame:
    """Record-level drops + field mapping + byte-golden serialization in one
    map-only pass: the distributed equivalent of the reference's
    per-record ``transform_s3_xsl`` output bytes (transform.py:39-84).
    ``order_col``: ARRAY<STRING> column of input keys in document order
    (see :func:`ordered_entries`)."""
    from tulflow_spark.transform.xslt import compile_xslt
    from tulflow_spark.transform.rules import record_keep_predicate

    sheet = compile_xslt(stylesheet, includes=includes)
    qname, decls = wrapper_ns_decls(stylesheet, includes)
    deleted = F.col(deleted_col) if deleted_col and deleted_col in df.columns else None
    order = F.col(order_col) if order_col else None
    kept = df.filter(record_keep_predicate(sheet, F.col(fields_col), deleted))
    return kept.withColumn(
        out_col,
        serialize_record(
            ordered_entries(sheet, F.col(fields_col), order), qname, decls
        ),
    )
