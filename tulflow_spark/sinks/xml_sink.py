"""XML collection sink: chunked, optionally content-addressed.

Reference behavior being re-expressed:

- records grouped into ``<oai:collection dag-id=… dag-timestamp=…>`` docs of
  at most ``records_per_file`` children (harvest.py:153-167, 182-183);
- output keys ``{dag_id}/{timestamp}/{stage}/{md5(content)}`` — the content
  hash makes writes idempotent (harvest.py:253-262, 271-273);
- the reference's always-write-a-trailing-empty-file quirk
  (harvest.py:201-210) is intentionally NOT reproduced (SURVEY.md §2.3 P1).

Implementation: ``foreachPartition`` writer — Spark's FileFormatWriter names
files by task id, so content-addressed naming needs a custom writer (SURVEY
§4.3).  Each partition streams rows, buffers up to ``records_per_file``,
serializes one collection per chunk, writes, and clears — memory is bounded
by chunk size, not partition size.  Writes go through ``tulflow_spark.fsio``
(pyarrow filesystems), so ``out_dir`` may be a local path or an object-store
URI (s3://, hdfs://, gs://) — the same partition writer runs unchanged on a
cluster, with no py4j dependency executor-side.
"""

from __future__ import annotations

import hashlib
import xml.etree.ElementTree as ET
from collections.abc import Iterator

from pyspark.sql import DataFrame

from tulflow_spark.model.xml_parse import OAI_NS


def dag_prefix(dag_id: str, timestamp: str) -> str:
    """Output partitioning scheme ``{dag_id}/{timestamp}``
    (reference: harvest.py:271-273)."""
    return f"{dag_id}/{timestamp}"


def write_string_content_addressed(content: str, out_dir: str) -> str:
    """Write one string object keyed by its md5 (reference: harvest.py:253-262).
    Returns the path written."""
    from tulflow_spark import fsio

    key = hashlib.md5(content.encode("utf-8")).hexdigest()
    path = f"{out_dir.rstrip('/')}/{key}"
    fsio.write_text(path, content)
    return path


def _record_element(row) -> ET.Element:
    """Envelope row → <oai:record> element (re-serialization of the model)."""
    rec = ET.Element(f"{{{OAI_NS}}}record")
    if row["identifier"] is not None:
        # durable record id stamped as an attribute so it survives
        # transformation — same attribute NAME as the reference staging format
        # (harvest.py:193 writes, validate.py:68 reads 'airflow-record-id') so
        # reference-layout consumers find it
        rec.set("airflow-record-id", row["identifier"])
    header = ET.SubElement(rec, f"{{{OAI_NS}}}header")
    if row["deleted"]:
        header.set("status", "deleted")
    if row["identifier"] is not None:
        ET.SubElement(header, f"{{{OAI_NS}}}identifier").text = row["identifier"]
    if row["datestamp"] is not None:
        ET.SubElement(header, f"{{{OAI_NS}}}datestamp").text = row[
            "datestamp"
        ].strftime("%Y-%m-%dT%H:%M:%SZ")
    for s in row["set_specs"] or []:
        ET.SubElement(header, f"{{{OAI_NS}}}setSpec").text = s
    if row["metadata_xml"] is not None:
        md = ET.SubElement(rec, f"{{{OAI_NS}}}metadata")
        md.append(ET.fromstring(row["metadata_xml"]))
    return rec


def write_oai_collections(
    df: DataFrame,
    out_dir: str,
    records_per_file: int = 1000,
    dag_id: str = "",
    timestamp: str = "",
    content_addressed: bool = True,
) -> None:
    """Write an envelope DataFrame as chunked collection XML files."""

    def write_partition(rows: Iterator) -> None:
        import hashlib as _hashlib
        import uuid as _uuid
        import xml.etree.ElementTree as _ET

        from tulflow_spark import fsio as _fsio

        def flush(buffer: list) -> None:
            if not buffer:
                return
            coll = _ET.Element(f"{{{OAI_NS}}}collection")
            if dag_id:
                coll.set("dag-id", dag_id)
            if timestamp:
                coll.set("dag-timestamp", timestamp)
            for el in buffer:
                coll.append(el)
            content = _ET.tostring(coll, encoding="unicode")
            if content_addressed:
                name = _hashlib.md5(content.encode("utf-8")).hexdigest()
            else:
                name = _uuid.uuid4().hex
            _fsio.write_text(f"{out_dir.rstrip('/')}/{name}", content)

        buffer: list = []
        for row in rows:
            buffer.append(_record_element(row))
            if len(buffer) >= records_per_file:
                flush(buffer)
                buffer = []
        flush(buffer)

    df.select(
        "identifier", "datestamp", "set_specs", "deleted", "metadata_xml"
    ).foreachPartition(write_partition)
