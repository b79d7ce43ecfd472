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
from tulflow_spark.transform.xslt import (
    UnsupportedXslt,
    compile_xslt,
    transform_records,
    transform_xml_with_engine,
)
from tulflow_spark.validation.ops import (
    filter_with_report,
    guard_not_all_filtered,
    split_on_violations,
)
from tulflow_spark.validation.schematron import (
    UnsupportedSchematron,
    parse_schematron,
    validate_xml_with_engine,
)


ENVELOPE_COLS = ("identifier", "datestamp", "set_specs", "deleted", "metadata_xml")


def _write_stage(
    df: DataFrame,
    out_dir: str,
    stage_format: str,
    records_per_file: int,
    dag_id: str,
    timestamp: str,
) -> None:
    if stage_format == "parquet":
        (
            df.select(*ENVELOPE_COLS)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", records_per_file)
            .parquet(out_dir)
        )
    elif stage_format == "xml":
        write_oai_collections(
            df, out_dir,
            records_per_file=records_per_file, dag_id=dag_id, timestamp=timestamp,
        )
    else:
        raise ValueError(f"unknown stage_format {stage_format!r}")


def _read_stage(spark: SparkSession, src_dir: str) -> DataFrame:
    """Read a staging prefix in either format (parquet dirs are
    self-identifying via their file extensions).  Missing/empty prefixes
    yield an empty frame — empty harvests must not fail downstream stages."""
    entries = os.listdir(src_dir) if os.path.isdir(src_dir) else []
    if any(e.endswith(".parquet") for e in entries):
        from tulflow_spark.io import read_parquet as _rp
        return _rp(spark, src_dir).withColumn(
            "source_file", F.input_file_name()
        )
    return read_oai_collections(spark, src_dir)  # handles missing path


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
    stage_format: str = "xml",
) -> HarvestResult:
    """Route updated/deleted and write both chunked stages
    (reference: harvest.py:170-215 process_xml + writers).

    ``records`` is an envelope DataFrame from any source (OAI harvest, staged
    collections, tarballs) — the pipeline is source-agnostic like
    ``process_xml``'s iterator argument.

    ``stage_format``: ``"xml"`` reproduces the reference's collection-file
    staging byte-compatibly in shape; ``"parquet"`` stages the parsed
    envelope columnar — the 100 TB default (no XML re-parse at every stage
    boundary, predicate pushdown between stages; see DESIGN.md §1).
    """
    updated, deleted = route_updated_deleted(records)
    prefix = os.path.join(base_dir, dag_prefix(dag_id, timestamp))
    _write_stage(
        updated, os.path.join(prefix, "new-updated"),
        stage_format, records_per_file, dag_id, timestamp,
    )
    _write_stage(
        deleted, os.path.join(prefix, "deleted"),
        stage_format, records_per_file, dag_id, timestamp,
    )
    counts = records.agg(
        F.sum(F.when(~F.col("deleted"), 1).otherwise(0)).alias("u"),
        F.sum(F.when(F.col("deleted"), 1).otherwise(0)).alias("d"),
    ).head()
    return HarvestResult(updated=counts.u or 0, deleted=counts.d or 0)


def _with_dc_fields(spark: SparkSession, source_dir: str) -> DataFrame:
    """Staged records (either format) → envelope + parsed DC ``fields``."""
    udfs = register_udfs()
    return _read_stage(spark, source_dir).withColumn(
        "fields", udfs["parse_dc"](F.col("metadata_xml"))
    )


def transform_staging(
    spark: SparkSession,
    source_dir: str,
    dest_dir: str,
    stylesheet: str | bytes,
    dag_id: str = "",
    timestamp: str = "",
    stage_format: str = "xml",
    engine_factory=None,
) -> int:
    """XSLT transform of a staged prefix (reference: transform.py:20-78,
    minus the per-record JVM fork and minus its cross-file accumulator bug).

    Routing: stylesheets inside the compilable subset run as pure column
    algebra; anything else falls back to a per-partition XSLT engine —
    the injected ``engine_factory`` if given, else
    ``transform.xslt.default_xslt_engine_factory`` (lxml where installed,
    otherwise the stdlib micro-interpreter
    :class:`~tulflow_spark.transform.microxslt.MicroXSLT`).  The compiler
    is an optimization, not a capability wall; a stylesheet outside both
    engines' surface raises a typed error at driver-side probe time.

    Returns the number of records written.
    """
    try:
        sheet = compile_xslt(stylesheet)
    except UnsupportedXslt:
        if engine_factory is None:
            from tulflow_spark.transform.xslt import (
                default_xslt_engine_factory,
            )

            engine_factory = default_xslt_engine_factory
        sheet = None
    if sheet is None:
        records = _read_stage(spark, source_dir)
        out = transform_xml_with_engine(records, stylesheet, engine_factory)
        # engine-dropped records (empty output / parse failure) leave the set
        out = out.filter(F.col("metadata_xml").isNotNull())
    else:
        records = _with_dc_fields(spark, source_dir)
        transformed = transform_records(records, sheet)
        # re-serialize the transformed field map as an oai_dc payload
        out = transformed.withColumn("metadata_xml", _dc_to_xml(F.col("fields")))
    # persist so the parse+transform lineage runs once: the write and the
    # counter both read the materialized frame (one pass + the write, not two
    # full recomputations of the mapInPandas parse at 100 TB)
    out = out.persist()
    try:
        _write_stage(out, dest_dir, stage_format, 1000, dag_id, timestamp)
        return out.count()
    finally:
        out.unpersist()


def _xml_escape(col):
    """Escape ``&``, ``<``, ``>`` in text content (xml.sax.saxutils.escape
    semantics) as column algebra — ``&`` first so entities aren't doubled.
    The reference serializes through lxml which escapes implicitly; without
    this, a value like ``AT&T`` produces malformed metadata_xml that the next
    stage's parser rejects."""
    escaped = F.regexp_replace(col, "&", "&amp;")
    escaped = F.regexp_replace(escaped, "<", "&lt;")
    return F.regexp_replace(escaped, ">", "&gt;")


def _dc_to_xml(fields):
    """MAP<STRING,ARRAY<STRING>> → oai_dc XML string, entirely with column
    algebra (element name = map key, one element per value; values escaped)."""
    entries = F.flatten(
        F.transform(
            F.map_entries(fields),
            lambda e: F.transform(
                e["value"],
                lambda v: F.concat(
                    F.lit("<"), e["key"], F.lit(">"),
                    _xml_escape(v),
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
    stage_format: str = "xml",
    engine_factory=None,
) -> ValidationResult:
    """Schematron filter of a staged prefix: valid records → XML stage,
    invalid rows → CSV report, all-filtered guard
    (reference: validate.py:10-123).

    Routing mirrors :func:`transform_staging`: rule sets inside the subset
    grammar compile to predicates; arbitrary ISO Schematron falls back to a
    per-partition engine — injected ``engine_factory`` or the default
    (lxml-isoschematron where installed, else the stdlib
    ``micro_schematron_engine``) — and both paths produce the same
    ``violations`` column, so the split/report/guard machinery is shared."""
    try:
        rules = parse_schematron(schematron)
    except UnsupportedSchematron:
        if engine_factory is None:
            from tulflow_spark.validation.schematron import (
                default_schematron_engine_factory,
            )

            engine_factory = default_schematron_engine_factory
        rules = None
    records = _with_dc_fields(spark, source_dir).withColumn(
        "record_id", F.col("identifier")
    )
    # persist: the XML parse + DC-parse lineage is consumed four ways (valid
    # write, report write, total count, valid count) — materialize it once
    # instead of re-running the mapInPandas parse per consumer (the 100 TB
    # anti-pattern VERDICT r1 flagged: two full extra corpus passes for two
    # scalars)
    records = records.persist()
    try:
        if rules is None:
            checked = validate_xml_with_engine(
                records, schematron, engine_factory
            )
            valid, invalid = split_on_violations(checked)
        else:
            valid, invalid = filter_with_report(records, rules)
        _write_stage(valid, dest_dir, stage_format, 1000, dag_id, timestamp)
        write_invalid_report(invalid, report_dir)
        total = records.count()
        n_valid = valid.count()
    finally:
        records.unpersist()
    guard_not_all_filtered(total, n_valid)
    return ValidationResult(total=total, valid=n_valid, filtered=total - n_valid)


def streaming_harvest_pipeline(
    spark: SparkSession,
    endpoint: str,
    snapshot_path: str,
    stylesheet: str | bytes,
    checkpoint: str,
    from_date: str = "1970-01-01T00:00:00Z",
    included_sets: str | None = None,
    engine_factory=None,
    n_buckets: int = 8,
):
    """The reference's whole DAG as ONE continuous pipeline (r4 VERDICT #7):
    OAI incremental-harvest stream → per-record XSLT transform → globally
    atomic manifest snapshot, keyed by OAI identifier with the datestamp as
    the CDC ordering column.

    Where the reference reruns ``harvest → transform → index`` as scheduled
    Airflow tasks over S3 prefixes (harvest.py:24-65, transform.py:20-78),
    this runs the same three stages as a Structured Streaming query: each
    micro-batch covers one closed datestamp window (the source's offsets),
    the transform is the same per-partition engine used in batch
    (stateless, so it lifts to streaming unchanged), and deletions —
    OAI ``status="deleted"`` headers — flow through as CDC delete flags
    that remove the key from the snapshot.  Readers always see one
    complete committed version (``ManifestSnapshot(path).read(spark)``).

    Returns the StreamingQuery; callers own its lifecycle.
    """
    from tulflow_spark.sources.oai import register_oai_source
    from tulflow_spark.streaming.manifest_snapshot import (
        cdc_snapshot_sink_atomic,
    )

    if engine_factory is None:
        from tulflow_spark.transform.xslt import default_xslt_engine_factory

        engine_factory = default_xslt_engine_factory
    register_oai_source(spark)
    reader = (
        spark.readStream.format("oai")
        .option("endpoint", endpoint)
        .option("from", from_date)
    )
    if included_sets:
        reader = reader.option("includedsets", included_sets)
    stream = reader.load()
    transformed = transform_xml_with_engine(stream, stylesheet, engine_factory)
    # a kept record whose transform failed (NULL metadata_xml) must not
    # shadow a good earlier version in the snapshot: drop it here; true
    # deletions pass through on the deleted flag regardless of payload
    transformed = transformed.filter(
        F.col("deleted") | F.col("metadata_xml").isNotNull()
    )
    return cdc_snapshot_sink_atomic(
        transformed,
        snapshot_path,
        keys=["identifier"],
        order_by=["datestamp"],
        deleted="deleted",
        checkpoint=checkpoint,
        n_buckets=n_buckets,
    )
