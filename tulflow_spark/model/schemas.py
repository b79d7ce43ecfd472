"""Spark schemas for the reference's data model (SURVEY.md §1.3).

- OAI record envelope: one row per harvested record
  (reference: harvest.py:153-167 collection docs; header fields per OAI-PMH).
- MARC21/slim payload: arrays (not maps) because tags repeat — duplicate 001s
  must be representable so get_record_001 can reject them
  (reference: process.py:66-80).
- Dublin Core payload: field -> repeated values map; repeated elements are the
  norm (reference: tests assert two identifiers join with newline,
  test_validate.py:463-465).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Envelope of one OAI-PMH record (reference: harvest.py:18-21 namespaces,
# harvest.py:95-112 iterator semantics).
OAI_RECORD_SCHEMA = StructType(
    [
        StructField("identifier", StringType()),
        StructField("datestamp", TimestampType()),
        StructField("set_specs", ArrayType(StringType())),
        StructField("deleted", BooleanType()),
        # raw first child of <metadata>; NULL when metadata absent
        StructField("metadata_xml", StringType()),
    ]
)

SUBFIELD_TYPE = StructType(
    [
        StructField("code", StringType()),
        StructField("value", StringType()),
    ]
)

DATAFIELD_TYPE = StructType(
    [
        StructField("tag", StringType()),
        StructField("ind1", StringType()),
        StructField("ind2", StringType()),
        StructField("subfields", ArrayType(SUBFIELD_TYPE)),
    ]
)

CONTROLFIELD_TYPE = StructType(
    [
        StructField("tag", StringType()),
        StructField("value", StringType()),
    ]
)

MARC_TYPE = StructType(
    [
        StructField("leader", StringType()),
        StructField("controlfields", ArrayType(CONTROLFIELD_TYPE)),
        StructField("datafields", ArrayType(DATAFIELD_TYPE)),
    ]
)

# Dublin Core / oai_dc payload: qualified field name -> repeated values.
DC_FIELDS_TYPE = MapType(StringType(), ArrayType(StringType()))
