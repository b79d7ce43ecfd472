"""Declarative field-mapping rules (the XSL-subset IR) and their compilation
to Spark column expressions over a DC map column.

IR mirrors what the reference's stylesheets actually do
(xsl-sample-simple.xsl / temple.xsl patterns):

- rename ``dc:x`` → ``dcterms:x`` with normalize-space, skipping empties;
- case-insensitive regex dispatch of a value into a controlled vocabulary
  (``dc:type`` → {Text, Image, Moving Image, …}) with an
  *otherwise* route to a different output field (``dcterms:format``);
- record-level drops: deleted-header records, records carrying a marker
  value (``dc:relation = 'pdcp_noharvest'``).

Compilation strategy: every input value becomes zero-or-one
(out_field, out_value) entries via a CASE chain; entries are regrouped into
the output MAP<STRING, ARRAY<STRING>> with pure array algebra — one
whole-stage-codegen map pass, no shuffle, no Python.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ValueCase:
    """One branch of a value dispatch."""

    out_field: str
    pattern: str | None = None  # case-insensitive regex; None = otherwise/always
    out_value: str | None = None  # constant; None = passthrough input value
    normalize: bool = True  # normalize-space the passthrough value
    # starts-with(., 'p') [or starts-with(., 'q')]* dispatch — the URI-vs-text
    # rights split in temple.xsl; tested on the RAW value, like XSLT
    prefixes: tuple[str, ...] | None = None
    # branch-level <xsl:if test="normalize-space(.)!=''"> wrapper (the subset
    # allows it per choose-branch, not only template-wide)
    skip_empty: bool = False
    # constant attributes on the output element (literal result-element
    # attributes / constant <xsl:attribute> constructors).  The MAP output
    # column carries element text only; attrs ride in the IR for serializers.
    attrs: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class FieldTemplate:
    """Everything a ``<xsl:template match="dc:x">`` in the subset can do."""

    match_field: str
    cases: tuple[ValueCase, ...]
    require_non_empty: bool = True
    # recursive substring-before/substring-after named-template idiom
    # (subj_template): split every value on the delimiter; XSLT emits the
    # intermediate pieces RAW and normalize-spaces only the final piece
    split_delimiter: str | None = None


@dataclass(frozen=True)
class RecordFilter:
    """Drop records where ``field`` contains ``value``
    (``not(dc:relation[string()='pdcp_noharvest'])``)."""

    exclude_field: str
    exclude_value: str


@dataclass(frozen=True)
class CompiledStylesheet:
    templates: tuple[FieldTemplate, ...]
    drop_deleted: bool = False
    record_filters: tuple[RecordFilter, ...] = field(default_factory=tuple)
    # constant named templates invoked from the root template
    # (<xsl:call-template name="hub"/> → one edm:provider per kept record)
    constants: tuple[tuple[str, str], ...] = field(default_factory=tuple)


def _normalize_space(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _split_pieces(t: FieldTemplate, v: Column) -> Column:
    # the recursive named-template idiom emits intermediate pieces raw
    # (substring-before) and normalize-spaces only the final one
    pieces = F.split(v, _re.escape(t.split_delimiter))
    last = F.size(pieces) - 1
    return F.transform(
        pieces,
        lambda p, i: F.when(i == last, _normalize_space(p)).otherwise(p),
    )


def template_values(t: FieldTemplate, fields: Column) -> Column:
    """The template's input values from the fields map, with the
    delimiter-split idiom applied when the template carries one."""
    values = F.coalesce(
        F.element_at(fields, F.lit(t.match_field)),
        F.array().cast("array<string>"),
    )
    if t.split_delimiter is not None:
        values = F.flatten(F.transform(values, lambda v: _split_pieces(t, v)))
    return values


def _attr_string(attrs: tuple[tuple[str, str], ...]) -> str:
    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")
        )

    return "".join(f' {k}="{esc(v)}"' for k, v in attrs)


def _case_chain(tpl: FieldTemplate, v: Column) -> Column:
    """value → STRUCT<key, value, attrs> (null key = dropped; attrs is the
    pre-rendered constant attribute string for serializers)."""
    norm = _normalize_space(v)
    out: Column | None = None
    branches = []
    for case in tpl.cases:
        value = (
            F.lit(case.out_value)
            if case.out_value is not None
            else (norm if case.normalize else v)
        )
        entry = F.struct(
            F.lit(case.out_field).alias("key"),
            value.alias("value"),
            F.lit(_attr_string(case.attrs)).alias("attrs"),
        )
        cond: Column | None = None
        if case.pattern is not None:
            cond = norm.rlike(f"(?i){case.pattern}")
        elif case.prefixes:
            cond = F.lit(False)
            for p in case.prefixes:
                cond = cond | v.startswith(p)
        if case.skip_empty:
            nonempty = norm != ""
            cond = nonempty if cond is None else (cond & nonempty)
        branches.append((cond, entry))
    null_entry = F.struct(
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast("string").alias("value"),
        F.lit(None).cast("string").alias("attrs"),
    )
    for cond, entry in reversed(branches):
        if cond is None:
            out = entry
        else:
            out = F.when(cond, entry).otherwise(
                out if out is not None else null_entry
            )
    out = out if out is not None else null_entry
    if tpl.require_non_empty:
        out = F.when(norm != "", out).otherwise(null_entry)
    return out


def apply_templates(
    sheet: CompiledStylesheet | tuple[FieldTemplate, ...] | list[FieldTemplate],
    fields: Column,
) -> Column:
    """New MAP<STRING, ARRAY<STRING>> from applying every template.

    Fields without a matching template are dropped — XSLT's behavior under
    the stylesheets' explicit drop-everything-else base template.
    """
    if isinstance(sheet, CompiledStylesheet):
        templates, constants = sheet.templates, sheet.constants
    else:
        templates, constants = tuple(sheet), ()

    def _entries_for(t: FieldTemplate) -> Column:
        return F.transform(
            template_values(t, fields), lambda v: _case_chain(t, v)
        )

    constant_entries = [
        F.array(
            F.struct(
                F.lit(k).alias("key"),
                F.lit(val).alias("value"),
                F.lit("").alias("attrs"),
            )
        )
        for k, val in constants
    ]
    entries = F.filter(
        F.flatten(
            F.array(*[_entries_for(t) for t in templates], *constant_entries)
        ),
        lambda e: e["key"].isNotNull(),
    )
    keys = F.array_distinct(F.transform(entries, lambda e: e["key"]))

    def _values_for(k: Column) -> Column:
        return F.transform(
            F.filter(entries, lambda e: e["key"] == k), lambda e: e["value"]
        )

    return F.map_from_arrays(keys, F.transform(keys, _values_for))


def record_keep_predicate(
    sheet: CompiledStylesheet, fields: Column, deleted: Column | None = None
) -> Column:
    """TRUE for records the stylesheet keeps."""
    keep = F.lit(True)
    if sheet.drop_deleted and deleted is not None:
        keep = keep & ~F.coalesce(deleted, F.lit(False))
    for rf in sheet.record_filters:
        vals = F.coalesce(
            F.element_at(fields, F.lit(rf.exclude_field)),
            F.array().cast("array<string>"),
        )
        keep = keep & ~F.array_contains(vals, rf.exclude_value)
    return keep
