"""Solr indexing sink (SURVEY §2.2 K7): the data-plane half the reference
delegates to its DAG repos — here a first-class ``foreachPartition`` batch
JSON poster.

Scale shape: each partition posts ``batch_size``-document JSON arrays to
``{collection}/update/json/docs``; one final commit is issued by the driver
(never per batch — per-batch commits are the classic Solr anti-pattern).
Failures raise inside the task so Spark's task retry handles transient
errors; the batch size bounds executor memory.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Iterator

from pyspark.sql import DataFrame

TIMEOUT_S = 30


def _post_json(url: str, payload: bytes) -> None:
    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=TIMEOUT_S) as resp:
        resp.read()


def index_to_solr(
    df: DataFrame,
    solr_url: str,
    collection: str,
    batch_size: int = 500,
    commit: bool = True,
) -> None:
    """POST every row (as a JSON document) to a Solr collection."""
    update_url = f"{solr_url.rstrip('/')}/{collection}/update/json/docs"

    def post_partition(rows: Iterator) -> None:
        batch: list[dict] = []

        def flush() -> None:
            if batch:
                _post_json(update_url, json.dumps(batch).encode("utf-8"))
                batch.clear()

        for row in rows:
            batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                flush()
        flush()

    df.foreachPartition(post_partition)
    if commit:
        _post_json(
            f"{solr_url.rstrip('/')}/{collection}/update?commit=true", b"[]"
        )


def index_stream_to_solr(
    stream_df: DataFrame,
    solr_url: str,
    collection: str,
    checkpoint: str,
    batch_size: int = 500,
):
    """Continuous Solr indexing: the streaming face of :func:`index_to_solr`.

    ``foreachBatch`` reuses the batch poster verbatim per micro-batch (one
    commit per micro-batch — the visibility point of streaming indexing;
    checkpointed batch ids give at-least-once delivery, which is correct
    for Solr because re-posting a document with the same ``id`` is an
    idempotent overwrite).

    Returns the started StreamingQuery; the caller owns its lifecycle.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        index_to_solr(
            batch_df, solr_url, collection, batch_size=batch_size, commit=True
        )

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
