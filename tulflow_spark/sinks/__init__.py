"""Sinks: chunked OAI collection XML, content-addressed writes, CSV reports
(SURVEY.md §2.2)."""

from tulflow_spark.sinks.xml_sink import (  # noqa: F401
    dag_prefix,
    write_oai_collections,
    write_string_content_addressed,
)
from tulflow_spark.sinks.report import write_invalid_report  # noqa: F401
