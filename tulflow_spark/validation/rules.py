"""Declarative validation rules → Spark Column predicates.

The reference validates each record against a compiled ISO Schematron and
removes/reports failures (validate.py:35-42,58-84).  The rule kinds observed
in its rule sets (sch-sample.sch:10-50) are exactly:

- ``required``: field (or an alternative field) must exist
- ``non_empty``: normalize-space(value) != ''
- ``starts_with``: value must start with a prefix (e.g. 'http')

We compile those to native predicates over the DC map column
(MAP<STRING, ARRAY<STRING>>) so validation is whole-stage-codegen JVM work —
per-record Python XML validation would be the 100 TB anti-pattern.  Arbitrary
Schematron beyond the subset raises at compile time (fail fast, not wrong).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

KINDS = ("required", "non_empty", "starts_with")


@dataclass(frozen=True)
class Rule:
    rule_id: str
    kind: str  # required | non_empty | starts_with
    field: str  # e.g. 'dcterms:title'
    message: str  # failed-assert text
    alt_field: str | None = None  # required: any-of alternative
    arg: str | None = None  # starts_with: the prefix

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(f"unsupported rule kind: {self.kind!r}")
        if self.kind == "starts_with" and not self.arg:
            raise ValueError("starts_with rule requires arg")


def _values(fields: Column, field: str) -> Column:
    return F.coalesce(
        F.element_at(fields, F.lit(field)), F.array().cast("array<string>")
    )


def _normalize_space(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def compile_rule(rule: Rule, fields: Column) -> Column:
    """Predicate: TRUE when the record PASSES the rule."""
    vals = _values(fields, rule.field)
    if rule.kind == "required":
        present = F.size(vals) > 0
        if rule.alt_field:
            present = present | (F.size(_values(fields, rule.alt_field)) > 0)
        return present
    # Field-context rules follow Schematron per-node semantics: EVERY node
    # matching the context must satisfy the assert; no nodes → vacuously true
    # (presence is the `required` rule's job).  F.forall is exactly that.
    if rule.kind == "non_empty":
        return F.forall(vals, lambda v: _normalize_space(v) != "")
    if rule.kind == "starts_with":
        prefix = rule.arg
        return F.forall(vals, lambda v: _normalize_space(v).startswith(prefix))
    raise AssertionError(rule.kind)


def violations_column(rules: list[Rule], fields: Column) -> Column:
    """ARRAY<STRING> of failed-assert messages (empty = valid) — the engine's
    analog of the SVRL failed-assert text list
    (reference: validate.py:219-226 schematron_failed_validation_text)."""
    checks = [
        F.when(~compile_rule(r, fields), F.lit(r.message)) for r in rules
    ]
    return F.filter(F.array(*checks), lambda m: m.isNotNull())
