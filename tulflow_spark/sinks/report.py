"""Invalid-record CSV report sink (reference: validate.py:29-33,105-118 —
columns id, report, record, source_file)."""

from __future__ import annotations

from pyspark.sql import DataFrame

REPORT_COLUMNS = ("id", "report", "record", "source_file")


def write_invalid_report(
    invalid: DataFrame, path: str, single_file: bool = True
) -> None:
    """Write the invalid report as CSV with a header.

    ``single_file=True`` mirrors the reference's one-report-per-run shape
    (fine: the report is a tiny side output).  At very large scale pass
    ``False`` and let each task write its own part file.
    """
    df = invalid.select(*REPORT_COLUMNS)
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").option("header", True).csv(path)


def log_sink(df, logger=None, max_rows: int = 20, level: str = "info") -> int:
    """Debug sink (reference: harvest.py:265-268 ``write_log`` — log instead
    of writing): logs a bounded sample plus the total count, returns the
    count.  The sample is a LIMIT, not a collect of the full frame."""
    import logging

    log = logger or logging.getLogger("tulflow_spark")
    emit = getattr(log, level)
    total = df.count()
    for row in df.limit(max_rows).collect():
        emit("%s", row.asDict())
    emit("log_sink: %d rows total (%d shown)", total, min(total, max_rows))
    return total
