"""DataFrame-to-DataFrame operators mirroring the reference's dataflow surface
(SURVEY.md §2.3-2.6): record routing, lookup enrichment, scalar extraction
with validation, counters."""

from tulflow_spark.operators.routing import (  # noqa: F401
    harvest_counts,
    route_updated_deleted,
    stamp_record_id,
)
