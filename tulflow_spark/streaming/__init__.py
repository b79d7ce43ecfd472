"""Structured Streaming surface: the incremental-harvest / event-analytics
capabilities the reference approximates with scheduled batch DAGs
(SURVEY §2.7), expressed natively."""

from tulflow_spark.streaming.events import (  # noqa: F401
    running_user_totals,
    sessionize,
    stream_dedupe,
    stream_events,
    windowed_rollup,
)
