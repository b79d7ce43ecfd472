"""tulflow_spark — a PySpark-native analytics engine with the data-processing
capabilities of ``tulibraries/tulflow`` (library-metadata ETL: OAI-PMH harvest,
XML record routing, lookup enrichment, XSLT-style transform, Schematron-style
validation, chunked/content-addressed sinks, Solr admin), plus large-scale
training-data pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Everything composes as ``DataFrame -> DataFrame``; physical strategy is left to
Catalyst (broadcast joins, AQE, whole-stage codegen).  Python UDFs appear only
where Spark's built-in expressions genuinely cannot express the semantics, and
then always as Arrow-batched pandas UDFs / ``mapInPandas``.
"""

__version__ = "0.1.0"
