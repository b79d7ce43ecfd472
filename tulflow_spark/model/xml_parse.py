"""XML parsing: pure-Python (xml.etree) record parsers plus their Spark
bindings (Arrow-batched pandas UDFs / mapInPandas).

The reference processes one lxml Element at a time in a single thread
(reference: harvest.py:190, transform.py:60, validate.py:64).  Here parsing
happens inside executors over Arrow batches; the per-record logic stays
semantically compatible (namespace handling, deleted detection, metadata
unwrap, root-namespace normalization) while the orchestration is Spark's.

lxml is not available in this environment; xml.etree covers the parsing
surface the reference exercises (XSLT lives in tulflow_spark.transform with
its own compile-to-columns strategy).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from datetime import datetime, timezone
from typing import Any

import pandas as pd  # module-level: pandas_udf type hints resolve against globals

# Public OAI-PMH / MARC namespaces (reference: harvest.py:18-21,
# process.py:12-15).
OAI_NS = "http://www.openarchives.org/OAI/2.0/"
MARC_NS = "http://www.loc.gov/MARC21/slim"
NS = {"oai": OAI_NS, "marc21": MARC_NS}

_TAG_RE = re.compile(r"^\{(?P<ns>[^}]*)\}(?P<local>.+)$")


def split_tag(tag: str) -> tuple[str | None, str]:
    """(namespace, localname) of an ElementTree tag."""
    m = _TAG_RE.match(tag)
    if m:
        return m.group("ns"), m.group("local")
    return None, tag


def strip_ns(tag: str) -> str:
    return split_tag(tag)[1]


def tostring(el: ET.Element) -> str:
    return ET.tostring(el, encoding="unicode")


def parse_datestamp(s: str | None) -> datetime | None:
    """OAI datestamps: YYYY-MM-DD or YYYY-MM-DDThh:mm:ssZ."""
    if not s:
        return None
    s = s.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    return None


def add_marc21xml_root_ns(raw: bytes | str) -> str:
    """Normalize: ensure the MARC21 default namespace on the root element,
    round-tripping through a parse so encoding errors surface early
    (reference: process.py:38-46 semantics)."""
    text = raw.decode("utf-8") if isinstance(raw, bytes) else raw
    root = ET.fromstring(text)
    ns, _local = split_tag(root.tag)
    if ns is None:
        # re-parse with an injected default namespace on the root tag
        text = re.sub(
            r"<(\w+)", rf'<\1 xmlns="{MARC_NS}"', text, count=1
        )
        root = ET.fromstring(text)
    return tostring(root)


# ---------------------------------------------------------------------------
# OAI envelope
# ---------------------------------------------------------------------------


def parse_oai_record(rec: ET.Element) -> dict[str, Any]:
    """One <record> (or <header> for deleted items) → envelope dict matching
    model.schemas.OAI_RECORD_SCHEMA.  Deleted detection per the reference's
    XPath ``.//oai:header[@status='deleted']`` (harvest.py:196)."""
    header = rec.find("oai:header", NS)
    if header is None and strip_ns(rec.tag) == "header":
        header = rec
    identifier = datestamp = None
    set_specs: list[str] = []
    deleted = False
    if header is not None:
        deleted = header.get("status") == "deleted"
        for child in header:
            local = strip_ns(child.tag)
            if local == "identifier":
                identifier = (child.text or "").strip() or None
            elif local == "datestamp":
                datestamp = parse_datestamp(child.text)
            elif local == "setSpec":
                if child.text:
                    set_specs.append(child.text.strip())
    metadata_xml = None
    metadata = rec.find("oai:metadata", NS)
    if metadata is not None:
        payload = list(metadata)
        if payload:
            metadata_xml = tostring(payload[0])
    return {
        "identifier": identifier,
        "datestamp": datestamp,
        "set_specs": set_specs,
        "deleted": deleted,
        "metadata_xml": metadata_xml,
    }


def iter_oai_records(doc: bytes | str) -> Iterator[dict[str, Any]]:
    """All <record> elements in a collection / ListRecords / GetRecord
    document, wherever they sit in the tree."""
    text = doc.decode("utf-8") if isinstance(doc, bytes) else doc
    root = ET.fromstring(text)
    if strip_ns(root.tag) == "record":
        yield parse_oai_record(root)
        return
    for rec in root.iter(f"{{{OAI_NS}}}record"):
        yield parse_oai_record(rec)


# ---------------------------------------------------------------------------
# MARC21/slim payload
# ---------------------------------------------------------------------------


def parse_marc(payload: str | None) -> dict[str, Any] | None:
    """MARC21/slim XML → dict matching model.schemas.MARC_TYPE.

    Arrays, not maps: repeated tags (duplicate 001s, multiple 035s) must be
    preserved so get_record_001 can reject duplicates
    (reference: process.py:66-80, record_001_dup fixture semantics)."""
    if payload is None:
        return None
    root = ET.fromstring(payload)
    if strip_ns(root.tag) != "record":
        found = next(root.iter(f"{{{MARC_NS}}}record"), None)
        if found is None:
            found = next((e for e in root.iter() if strip_ns(e.tag) == "record"), None)
        if found is None:
            return None
        root = found
    leader = None
    controlfields: list[dict[str, str | None]] = []
    datafields: list[dict[str, Any]] = []
    for el in root:
        local = strip_ns(el.tag)
        if local == "leader":
            leader = el.text
        elif local == "controlfield":
            controlfields.append({"tag": el.get("tag"), "value": el.text})
        elif local == "datafield":
            datafields.append(
                {
                    "tag": el.get("tag"),
                    "ind1": el.get("ind1"),
                    "ind2": el.get("ind2"),
                    "subfields": [
                        {"code": sf.get("code"), "value": sf.text}
                        for sf in el
                        if strip_ns(sf.tag) == "subfield"
                    ],
                }
            )
    return {"leader": leader, "controlfields": controlfields, "datafields": datafields}


def marc_to_xml(marc: dict[str, Any]) -> str:
    """Inverse of parse_marc (used by the XML sinks)."""
    root = ET.Element(f"{{{MARC_NS}}}record")
    if marc.get("leader") is not None:
        ET.SubElement(root, f"{{{MARC_NS}}}leader").text = marc["leader"]
    for cf in marc.get("controlfields") or []:
        el = ET.SubElement(root, f"{{{MARC_NS}}}controlfield", tag=cf["tag"] or "")
        el.text = cf.get("value")
    for df in marc.get("datafields") or []:
        el = ET.SubElement(
            root,
            f"{{{MARC_NS}}}datafield",
            tag=df["tag"] or "",
            ind1=df.get("ind1") or " ",
            ind2=df.get("ind2") or " ",
        )
        for sf in df.get("subfields") or []:
            s = ET.SubElement(el, f"{{{MARC_NS}}}subfield", code=sf["code"] or "")
            s.text = sf.get("value")
    return tostring(root)


# ---------------------------------------------------------------------------
# Dublin Core / oai_dc payload
# ---------------------------------------------------------------------------


def parse_dc(payload: str | None) -> dict[str, list[str]] | None:
    """Flat qualified-name -> repeated-values map (reference: validate.py
    reads ./dcterms:identifier etc.; repeated elements are the norm).

    Keys use the element's namespace-prefix-free qualified form
    ``prefix:local`` when a known prefix matches, else just the local name.
    """
    if payload is None:
        return None
    root = ET.fromstring(payload)
    fields: dict[str, list[str]] = {}
    prefixes = {
        "http://purl.org/dc/terms/": "dcterms",
        "http://purl.org/dc/elements/1.1/": "dc",
        "http://www.europeana.eu/schemas/edm/": "edm",
    }
    for el in root.iter():
        if el is root or len(el):  # only leaf value elements
            continue
        ns, local = split_tag(el.tag)
        key = f"{prefixes[ns]}:{local}" if ns in prefixes else local
        fields.setdefault(key, []).append(el.text or "")
    return fields


# ---------------------------------------------------------------------------
# Spark bindings
# ---------------------------------------------------------------------------


def register_udfs():
    """Arrow-batched parser UDFs.  Imported lazily so pure-Python callers
    (and the oracle tests) never touch pyspark."""
    from pyspark.sql.functions import pandas_udf

    from tulflow_spark.model.schemas import DC_FIELDS_TYPE, MARC_TYPE

    _EMPTY = {"leader": None, "controlfields": None, "datafields": None}

    # Iterator form: per-executor setup happens once, not per batch.  Type
    # hints must name module-global symbols (PEP 563 strings are resolved
    # against this module's globals by pyspark's hint inferencer).
    @pandas_udf(MARC_TYPE)
    def parse_marc_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for xml in it:
            rows = [parse_marc(x) if x is not None else None for x in xml]
            yield pd.DataFrame([r if r is not None else _EMPTY for r in rows])

    @pandas_udf(DC_FIELDS_TYPE)
    def parse_dc_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for xml in it:
            yield pd.Series([parse_dc(x) if x is not None else None for x in xml])

    return {"parse_marc": parse_marc_udf, "parse_dc": parse_dc_udf}


def read_oai_collections(spark, path, glob: str | None = None):
    """Read OAI collection XML files → envelope DataFrame (one row per
    record, plus ``source_file`` provenance like the reference's per-key
    loop, validate.py:45-58).

    binaryFile scan → mapInPandas: file-level parallelism, streaming
    iteration, no driver involvement.  ``glob`` filters filenames (staged
    collection files are content-addressed md5 names with no extension, so
    the default reads everything under ``path``).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    from tulflow_spark.model.schemas import OAI_RECORD_SCHEMA

    # NB: StructType.add mutates in place — build a fresh schema instead of
    # poisoning the shared module-level constant.
    out_schema = StructType(
        list(OAI_RECORD_SCHEMA.fields) + [StructField("source_file", StringType())]
    )

    import os as _os

    if not _os.path.exists(path):
        # an empty harvest writes no staging dir at all; downstream stages
        # must see an empty frame, not PATH_NOT_FOUND (reference semantics:
        # empty prefixes yield zero counts, not failures)
        return spark.createDataFrame([], out_schema)

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, file_row in pdf.iterrows():
                for rec in iter_oai_records(bytes(file_row["content"])):
                    rec["source_file"] = file_row["path"]
                    rows.append(rec)
            if rows:
                yield pd.DataFrame(rows)

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return (
        reader.load(path)
        .select("path", "content")
        .mapInPandas(gen, schema=out_schema)
    )
