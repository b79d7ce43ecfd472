"""End-to-end pipeline wrappers — thin compositions over the operators,
mirroring the reference's task functions (SURVEY.md §3):

- :func:`harvest_to_staging`  ≙ ``harvest.oai_to_s3`` (harvest.py:24-65)
- :func:`transform_staging`   ≙ ``transform.transform_s3_xsl`` (transform.py:20-78)
- :func:`validate_staging`    ≙ ``validate.filter_s3_schematron`` (validate.py:10-123)

Each stage reads and writes a staging prefix ``{dag_id}/{timestamp}/{stage}``
exactly like the reference's S3 layout; paths are plain filesystem URIs
(s3a:// works transparently through Hadoop on a real cluster).

The reference's per-record counters come back as small aggregate queries —
at scale they're one extra map-side-combined pass, not a driver loop.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tulflow_spark.model.xml_parse import read_oai_collections, register_udfs
from tulflow_spark.operators.routing import route_updated_deleted
from tulflow_spark.sinks.report import write_invalid_report
from tulflow_spark.sinks.xml_sink import dag_prefix, write_oai_collections
from tulflow_spark.transform.xslt import compile_xslt, transform_records
from tulflow_spark.validation.ops import filter_with_report, guard_not_all_filtered
from tulflow_spark.validation.schematron import parse_schematron


@dataclass
class HarvestResult:
    updated: int
    deleted: int


def harvest_to_staging(
    records: DataFrame,
    base_dir: str,
    dag_id: str,
    timestamp: str,
    records_per_file: int = 1000,
) -> HarvestResult:
    """Route updated/deleted and write both chunked stages
    (reference: harvest.py:170-215 process_xml + writers).

    ``records`` is an envelope DataFrame from any source (OAI harvest, staged
    collections, tarballs) — the pipeline is source-agnostic like
    ``process_xml``'s iterator argument.
    """
    updated, deleted = route_updated_deleted(records)
    prefix = os.path.join(base_dir, dag_prefix(dag_id, timestamp))
    write_oai_collections(
        updated, os.path.join(prefix, "new-updated"),
        records_per_file=records_per_file, dag_id=dag_id, timestamp=timestamp,
    )
    write_oai_collections(
        deleted, os.path.join(prefix, "deleted"),
        records_per_file=records_per_file, dag_id=dag_id, timestamp=timestamp,
    )
    counts = records.agg(
        F.sum(F.when(~F.col("deleted"), 1).otherwise(0)).alias("u"),
        F.sum(F.when(F.col("deleted"), 1).otherwise(0)).alias("d"),
    ).head()
    return HarvestResult(updated=counts.u or 0, deleted=counts.d or 0)


def _with_dc_fields(spark: SparkSession, source_dir: str) -> DataFrame:
    """Staged collections → envelope + parsed DC ``fields`` column."""
    udfs = register_udfs()
    return read_oai_collections(spark, source_dir).withColumn(
        "fields", udfs["parse_dc"](F.col("metadata_xml"))
    )


def transform_staging(
    spark: SparkSession,
    source_dir: str,
    dest_dir: str,
    stylesheet: str | bytes,
    dag_id: str = "",
    timestamp: str = "",
) -> int:
    """XSLT-subset transform of a staged prefix (reference: transform.py:20-78,
    minus the per-record JVM fork and minus its cross-file accumulator bug).

    Returns the number of records written.
    """
    sheet = compile_xslt(stylesheet)
    records = _with_dc_fields(spark, source_dir)
    transformed = transform_records(records, sheet)
    # re-serialize the transformed field map as an oai_dc payload
    out = transformed.withColumn("metadata_xml", _dc_to_xml(F.col("fields")))
    write_oai_collections(
        out, dest_dir, dag_id=dag_id, timestamp=timestamp
    )
    return transformed.count()


def _dc_to_xml(fields):
    """MAP<STRING,ARRAY<STRING>> → oai_dc XML string, entirely with column
    algebra (element name = map key, one element per value)."""
    entries = F.flatten(
        F.transform(
            F.map_entries(fields),
            lambda e: F.transform(
                e["value"],
                lambda v: F.concat(
                    F.lit("<"), e["key"], F.lit(">"),
                    v,
                    F.lit("</"), e["key"], F.lit(">"),
                ),
            ),
        )
    )
    return F.concat(
        F.lit(
            '<oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"'
            ' xmlns:dc="http://purl.org/dc/elements/1.1/"'
            ' xmlns:dcterms="http://purl.org/dc/terms/"'
            ' xmlns:edm="http://www.europeana.eu/schemas/edm/">'
        ),
        F.array_join(entries, ""),
        F.lit("</oai_dc:dc>"),
    )


@dataclass
class ValidationResult:
    total: int
    valid: int
    filtered: int


def validate_staging(
    spark: SparkSession,
    source_dir: str,
    dest_dir: str,
    report_dir: str,
    schematron: str | bytes,
    dag_id: str = "",
    timestamp: str = "",
) -> ValidationResult:
    """Schematron-subset filter of a staged prefix: valid records → XML
    stage, invalid rows → CSV report, all-filtered guard
    (reference: validate.py:10-123)."""
    rules = parse_schematron(schematron)
    records = _with_dc_fields(spark, source_dir).withColumn(
        "record_id", F.col("identifier")
    )
    valid, invalid = filter_with_report(records, rules)
    write_oai_collections(valid, dest_dir, dag_id=dag_id, timestamp=timestamp)
    write_invalid_report(invalid, report_dir)
    total = records.count()
    n_valid = valid.count()
    guard_not_all_filtered(total, n_valid)
    return ValidationResult(total=total, valid=n_valid, filtered=total - n_valid)
