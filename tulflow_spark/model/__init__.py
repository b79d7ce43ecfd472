"""Data model: OAI-PMH record envelopes, MARC21/slim and Dublin Core payloads
as Spark struct/array/map types, plus xml.etree-based parsers exposed as
Arrow-batched pandas UDFs (SURVEY.md §1)."""

from tulflow_spark.model.schemas import (  # noqa: F401
    DC_FIELDS_TYPE,
    MARC_TYPE,
    OAI_RECORD_SCHEMA,
)
