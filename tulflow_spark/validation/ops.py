"""Validation dataflow operators: filter-with-side-output and report-only
modes (reference: validate.py:10-123 filter_s3_schematron, :126-199
report_s3_schematron).

Shape: one scan → violations column → two projections.  The reference's
mutation-during-iteration bug (validate.py:64-71) has no analog here — the
split is declarative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tulflow_spark.functions import identifier_or_full_record
from tulflow_spark.validation.rules import Rule, violations_column


class AllRecordsFilteredError(RuntimeError):
    """Raised when validation filtered out EVERY record of a non-empty input
    (reference: validate.py:119-122 AirflowFailException)."""


def _report_projection(
    df: DataFrame,
    id_field: str = "dcterms:identifier",
    fields_col: str = "fields",
    record_col: str = "metadata_xml",
    source_col: str = "source_file",
) -> list[Column]:
    """The invalid-report row shape (id, report, record, source_file) —
    reference: validate.py:29-33; record identity falls back to the full
    record when no identifier exists (validate.py:202-216)."""
    ids = F.coalesce(
        F.element_at(F.col(fields_col), F.lit(id_field)),
        F.array().cast("array<string>"),
    )
    return [
        F.coalesce(F.col("record_id").cast("string"), F.lit("")).alias("id"),
        F.array_join(F.col("violations"), "\n").alias("report"),
        identifier_or_full_record(ids, F.col(record_col)).alias("record"),
        F.col(source_col).alias("source_file"),
    ]


def with_violations(
    df: DataFrame, rules: list[Rule], fields_col: str = "fields"
) -> DataFrame:
    return df.withColumn(
        "violations", violations_column(rules, F.col(fields_col))
    )


def split_on_violations(
    checked: DataFrame, fields_col: str = "fields", **proj_kwargs
) -> tuple[DataFrame, DataFrame]:
    """Split a frame carrying a ``violations ARRAY<STRING>`` column into
    (valid_records, invalid_report) — shared by the rule-compiler path and
    the arbitrary-Schematron engine path (both produce the same column)."""
    valid = checked.filter(F.size("violations") == 0).drop("violations")
    invalid = checked.filter(F.size("violations") > 0).select(
        *_report_projection(checked, fields_col=fields_col, **proj_kwargs)
    )
    return valid, invalid


def filter_with_report(
    df: DataFrame,
    rules: list[Rule],
    fields_col: str = "fields",
    **proj_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """(valid_records, invalid_report) — the filter pipeline's two sinks.

    Call :func:`guard_not_all_filtered` after writing if the reference's
    all-filtered failure semantics are wanted; it's a driver-side count
    check, kept separate so callers control when the action runs.
    """
    checked = with_violations(df, rules, fields_col)
    return split_on_violations(checked, fields_col=fields_col, **proj_kwargs)


def report_all(
    df: DataFrame,
    rules: list[Rule],
    fields_col: str = "fields",
    **proj_kwargs,
) -> DataFrame:
    """Report-only mode: one row per record, empty ``report`` when valid,
    never drops data (reference: validate.py:126-199)."""
    checked = with_violations(df, rules, fields_col)
    return checked.select(
        *_report_projection(checked, fields_col=fields_col, **proj_kwargs)
    )


def guard_not_all_filtered(total: int, valid: int) -> None:
    """Driver-side guard (reference: validate.py:119-122): a non-empty run
    whose records ALL failed validation is an error, not a quiet no-op."""
    if total > 0 and valid == 0:
        raise AllRecordsFilteredError(
            f"all {total} records failed validation"
        )
