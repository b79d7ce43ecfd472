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


@dataclass(frozen=True)
class FieldTemplate:
    """Everything a ``<xsl:template match="dc:x">`` in the subset can do."""

    match_field: str
    cases: tuple[ValueCase, ...]
    require_non_empty: bool = True


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


def _normalize_space(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _case_chain(tpl: FieldTemplate, v: Column) -> Column:
    """value → STRUCT<key, value> (null key = dropped)."""
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
            F.lit(case.out_field).alias("key"), value.alias("value")
        )
        branches.append((case.pattern, entry))
    null_entry = F.struct(
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast("string").alias("value"),
    )
    for pattern, entry in reversed(branches):
        if pattern is None:
            out = entry
        else:
            out = F.when(norm.rlike(f"(?i){pattern}"), entry).otherwise(
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
    templates = sheet.templates if isinstance(sheet, CompiledStylesheet) else tuple(sheet)

    def _entries_for(t: FieldTemplate) -> Column:
        return F.transform(
            F.coalesce(
                F.element_at(fields, F.lit(t.match_field)),
                F.array().cast("array<string>"),
            ),
            lambda v: _case_chain(t, v),
        )

    entries = F.filter(
        F.flatten(F.array(*[_entries_for(t) for t in templates])),
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
