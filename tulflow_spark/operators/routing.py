"""Record routing & pipeline counters.

Re-expresses the reference's central ``process_xml`` dataflow
(reference: tulflow/harvest.py:170-215) as declarative DataFrame ops:

- stamp a durable record id          (harvest.py:191-193 ``airflow-record-id``)
- split updated vs deleted streams   (harvest.py:196-203)
- per-set / total counters           (harvest.py:55-65,213-215)

Chunking into ≤N-record collection files (harvest.py:182-183) is a sink
concern: ``df.write.option("maxRecordsPerFile", n)`` — see sinks.xml_sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stamp_record_id(
    df: DataFrame,
    identifier_col: str = "identifier",
    out_col: str = "record_id",
) -> DataFrame:
    """Copy the envelope identifier onto the record so it survives transforms
    (reference: harvest.py:191-193)."""
    return df.withColumn(out_col, F.col(identifier_col))


def route_updated_deleted(
    df: DataFrame, deleted: Column | str = "deleted"
) -> tuple[DataFrame, DataFrame]:
    """Partition a record stream into (updated, deleted) — the two output
    prefixes of the reference harvest (harvest.py:196-203).  Two filters over
    one cached/scanned source; Catalyst shares the scan under AQE."""
    cond = F.col(deleted) if isinstance(deleted, str) else deleted
    return df.filter(~cond), df.filter(cond)


def with_route(df: DataFrame, deleted: Column | str = "deleted") -> DataFrame:
    """Single-pass variant: adds a ``route`` column ('updated'/'deleted')
    instead of splitting, so downstream writes can ``partitionBy("route")``
    with ONE scan and no duplicated upstream work — the shape that wins at
    100 TB."""
    cond = F.col(deleted) if isinstance(deleted, str) else deleted
    return df.withColumn(
        "route", F.when(cond, F.lit("deleted")).otherwise(F.lit("updated"))
    )


def harvest_counts(
    df: DataFrame,
    set_col: str = "source_set",
    deleted: Column | str = "deleted",
) -> DataFrame:
    """Per-set updated/deleted counters (reference: harvest.py:55-65).

    Map-side partial aggregation makes this a near-free pass even at 100 TB:
    one shuffle of #sets rows.
    """
    cond = F.col(deleted) if isinstance(deleted, str) else deleted
    return df.groupBy(set_col).agg(
        F.sum(F.when(~cond, 1).otherwise(0)).alias("updated"),
        F.sum(F.when(cond, 1).otherwise(0)).alias("deleted"),
    )


def sets_with_no_records(requested_sets: DataFrame, harvested: DataFrame,
                         set_col: str = "source_set") -> DataFrame:
    """Requested-but-empty sets (reference: harvest.py:41-43,50-51 — note the
    reference's no-sets branch has a latent NameError we do not reproduce).
    Anti-join keeps this fully distributed."""
    return requested_sets.join(
        harvested.select(set_col).distinct(), on=set_col, how="left_anti"
    )
