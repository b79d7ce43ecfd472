"""The ETL compilers on STREAMING frames: the compiled XSLT-subset transform
and Schematron-subset validation are pure column algebra, so the exact same
objects run on a file stream — scheduled-batch DAGs become continuous
pipelines with no operator changes."""

from __future__ import annotations

import pytest

from tulflow_spark.transform.rules import (
    CompiledStylesheet,
    FieldTemplate,
    ValueCase,
    apply_templates,
)
from tulflow_spark.validation.rules import Rule, violations_column

import pyspark.sql.functions as F

SHEET = CompiledStylesheet(
    templates=(
        FieldTemplate(
            "dc:title",
            cases=(ValueCase(out_field="dcterms:title"),),
        ),
    )
)
RULES = [Rule("R1", "required", "dcterms:title", "no title")]


@pytest.fixture(scope="module")
def record_stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rec_stream")
    spark.createDataFrame(
        [
            ("r1", {"dc:title": ["  Good  Title "]}),
            ("r2", {"dc:junk": ["x"]}),
            ("r3", {"dc:title": ["Another"]}),
        ],
        "record_id string, fields map<string,array<string>>",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "data"))
    return str(d / "data")


def test_transform_and_validate_on_stream(spark, record_stream_dir):
    stream = (
        spark.readStream.schema(
            "record_id string, fields map<string,array<string>>"
        ).parquet(record_stream_dir)
    )
    assert stream.isStreaming
    transformed = stream.withColumn(
        "fields", apply_templates(SHEET, F.col("fields"))
    ).withColumn("violations", violations_column(RULES, F.col("fields")))

    q = (
        transformed.writeStream.format("memory")
        .queryName("etl_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.record_id: r for r in spark.table("etl_stream").collect()}
    assert rows["r1"].fields["dcterms:title"] == ["Good Title"]
    assert list(rows["r1"].violations) == []
    assert list(rows["r2"].violations) == ["no title"]
    assert rows["r3"].fields["dcterms:title"] == ["Another"]
