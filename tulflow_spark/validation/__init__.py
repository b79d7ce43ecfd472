"""Validation: ISO-Schematron-subset rules compiled to Spark predicates, with
filter (drop-invalid + CSV side-output) and report-only modes
(reference: validate.py — SURVEY.md §2.4)."""

from tulflow_spark.validation.rules import (  # noqa: F401
    Rule,
    compile_rule,
    violations_column,
)
from tulflow_spark.validation.schematron import parse_schematron  # noqa: F401
from tulflow_spark.validation.ops import (  # noqa: F401
    AllRecordsFilteredError,
    filter_with_report,
    report_all,
)
