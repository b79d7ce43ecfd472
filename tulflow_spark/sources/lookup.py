"""Boundwith lookup CSV source (reference: harvest.py:224-232 — a small CSV
fetched once per process and probed per record; here a DataFrame destined for
the broadcast side of the enrichment join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LOOKUP_SCHEMA = "child_id BIGINT, parent_id BIGINT, parent_xml STRING"


def read_boundwith_lookup(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("header", True)
        .schema(LOOKUP_SCHEMA)
        .csv(path)
    )
