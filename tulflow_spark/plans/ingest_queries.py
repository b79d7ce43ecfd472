"""Round-10 ingestion registry: WARC/WET container pairs (the Common
Crawl first mile — r9 VERDICT #2), later joined by PDF extraction and
Delta deletion-vector reads.

Fixture strategy is the proven mm*/media one: the corpus has no real
archive bytes, so each query BUILDS archives deterministically from
`documents` rows with the production fixture encoder
(`sources/warc.py::encode_warc`), walks them with the PRODUCTION
reader/HTTP parser, and emits values the DuckDB oracle recomputes
analytically from the same `documents` columns — an honest end-to-end
decode check without synthesizing input files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tulflow_spark.io import table
from tulflow_spark.plans import register


@register(
    "warc1_warc_ingest",
    oracle="""
    SELECT d.doc_id,
           CAST(3 AS BIGINT) AS n_records,
           'https://' || d.source || '.example.org/doc/'
               || CAST(d.doc_id AS VARCHAR) AS target_uri,
           CAST(200 AS INT) AS status,
           CAST(strlen(COALESCE(d.text, '')) AS BIGINT) AS wet_bytes,
           strftime(TIMESTAMP '2024-01-01 00:00:00'
                    + to_seconds(d.doc_id % 86400),
                    '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
           md5(COALESCE(d.text, '')) AS body_md5,
           TRUE AS http_roundtrip
    FROM documents d
    """,
)
def warc1_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC record walk + HTTP entity parse oracle-checked end to end.

    Per doc, a three-record archive (warcinfo, response, conversion —
    the Common Crawl WARC/WET shape, one gzip member per record) is
    built by the production fixture encoder; the response's HTTP wire
    form varies by doc_id % 3 — identity, Content-Encoding: gzip,
    Transfer-Encoding: chunked — so all three entity-decode paths are
    driver-proven.  The PRODUCTION `iter_warc_records` +
    `parse_http_response` recover status, target URI, WARC-Date, and
    the exact payload; the oracle recomputes every output (byte counts,
    md5, formatted date) from `documents` columns in pure SQL."""
    from collections.abc import Iterator

    import pandas as pd

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", "text", "source").repartition(32))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip
        import hashlib
        from datetime import datetime, timedelta

        from tulflow_spark.sources.warc import (
            encode_warc,
            iter_warc_records,
            parse_http_response,
        )

        def chunked(b: bytes) -> bytes:
            out = bytearray()
            for i in range(0, len(b), 7):
                part = b[i:i + 7]
                out += f"{len(part):x}\r\n".encode() + part + b"\r\n"
            out += b"0\r\n\r\n"
            return bytes(out)

        base = datetime(2024, 1, 1)
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                d = int(r["doc_id"])
                raw = (r["text"] or "").encode()
                uri = f"https://{r['source']}.example.org/doc/{d}"
                date = (base + timedelta(seconds=d % 86400)).strftime(
                    "%Y-%m-%dT%H:%M:%SZ")
                variant = d % 3
                if variant == 1:
                    http = (b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/plain\r\n"
                            b"Content-Encoding: gzip\r\n\r\n"
                            + gzip.compress(raw, mtime=0))
                elif variant == 2:
                    http = (b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/plain\r\n"
                            b"Transfer-Encoding: chunked\r\n\r\n"
                            + chunked(raw))
                else:
                    http = (b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/plain\r\n\r\n" + raw)
                archive = encode_warc([
                    {"warc_type": "warcinfo", "date": date,
                     "block": b"software: tulflow_spark\r\n",
                     "content_type": "application/warc-fields"},
                    {"warc_type": "response", "uri": uri, "date": date,
                     "block": http,
                     "content_type":
                         "application/http; msgtype=response"},
                    {"warc_type": "conversion", "uri": uri,
                     "date": date, "block": raw,
                     "content_type": "text/plain"},
                ])
                recs = list(iter_warc_records(archive))
                resp = next(x for x in recs if x.warc_type == "response")
                conv = next(x for x in recs
                            if x.warc_type == "conversion")
                status, _, body = parse_http_response(resp.block)
                rows.append({
                    "doc_id": d,
                    "n_records": len(recs),
                    "target_uri": resp.target_uri,
                    "status": status,
                    "wet_bytes": len(conv.block),
                    "warc_date": resp.warc_date,
                    "body_md5": hashlib.md5(body).hexdigest(),
                    "http_roundtrip": bool(
                        status == 200 and body == raw
                        and conv.block == raw),
                })
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id bigint, n_records bigint, target_uri string, "
               "status int, wet_bytes bigint, warc_date string, "
               "body_md5 string, http_roundtrip boolean",
    )


@register(
    "pdf1_pdf_extract",
    oracle="""
    WITH base AS (
      SELECT doc_id, md5(COALESCE(text, '')) AS h,
             COALESCE(lang, '') AS lang,
             1 + doc_id % 3 AS n_pages
      FROM documents
    ),
    built AS (
      SELECT doc_id, n_pages,
             string_agg(
               'Document ' || CAST(doc_id AS VARCHAR) || ' page '
                 || CAST(p AS VARCHAR) || chr(10) || h || chr(10)
                 || 'lang ' || lang,
               chr(12) ORDER BY p) AS full_text
      FROM base, UNNEST(range(0, n_pages)) AS r(p)
      GROUP BY doc_id, n_pages
    )
    SELECT doc_id,
           CAST(n_pages AS INT) AS n_pages,
           CAST(length(full_text) AS BIGINT) AS n_chars,
           md5(full_text) AS extracted_md5,
           TRUE AS md5_on_every_page
    FROM built
    """,
)
def pdf1_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction oracle-checked end to end (r9 VERDICT #3).

    Per doc, a 1–3-page PDF is built by the production fixture encoder
    (`ext/pdf.py::encode_pdf` — xref table, Flate-compressed content
    streams; odd docs emit kerned TJ arrays so both show paths are
    driver-proven) whose page text is analytic in the doc row:
    ``Document <id> page <p> / md5(text) / lang <lang>``.  The
    PRODUCTION parser (object scan, Flate decode, page-tree walk,
    content-stream interpreter) must recover the page count and the
    exact text — the oracle rebuilds the full extracted string,
    form-feeds and all, in pure SQL and hash-compares."""
    from collections.abc import Iterator

    import pandas as pd

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", "text", "lang").repartition(32))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from tulflow_spark.ext.pdf import PdfDocument, encode_pdf

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                d = int(r["doc_id"])
                h = hashlib.md5((r["text"] or "").encode()).hexdigest()
                lang = r["lang"] or ""
                n_pages = 1 + d % 3
                pages = [
                    [f"Document {d} page {p}", h, f"lang {lang}"]
                    for p in range(n_pages)
                ]
                blob = encode_pdf(pages, use_tj_arrays=bool(d % 2))
                doc = PdfDocument(blob)
                page_objs = doc.pages()
                extracted = "\f".join(
                    doc.page_text(p) for p in page_objs)
                rows.append({
                    "doc_id": d,
                    "n_pages": len(page_objs),
                    "n_chars": len(extracted),
                    "extracted_md5": hashlib.md5(
                        extracted.encode()).hexdigest(),
                    "md5_on_every_page": all(
                        h in pg for pg in extracted.split("\f")),
                })
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id bigint, n_pages int, n_chars bigint, "
               "extracted_md5 string, md5_on_every_page boolean",
    )


@register(
    "dl5_deletion_vectors",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_before,
           COUNT(*) AS n_after,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(1 AS BIGINT) AS n_files
    FROM documents WHERE doc_id % 7 <> 0
    """,
)
def dl5_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta deletion-vector READ path oracle-checked (r9 VERDICT #4):
    write documents as one doc_id-sorted file (doc_ids are dense, so
    row_index == doc_id), row-level-DELETE every doc_id % 7 == 0 via a
    spec-layout DV commit (`delete_rows_with_dv` — remove+re-add of the
    SAME file carrying the roaring-bitmap descriptor, protocol upgraded
    to reader 3 / deletionVectors), then snapshot-read.  The oracle
    recomputes the surviving aggregates from the raw table; ``n_files``
    pins merge-on-read (the data file was NOT rewritten) and
    ``n_before`` pins that time travel below the DV commit still sees
    every row."""
    from tulflow_spark.ext.delta_log import (
        _replay,
        delete_rows_with_dv,
        read_delta,
        write_delta,
    )

    import tempfile

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .coalesce(1).sortWithinPartitions("doc_id"))
    t = tempfile.mkdtemp(prefix="dl5_") + "/tbl"
    write_delta(docs, t)                                       # v0
    snap = _replay(spark, t, None)
    (add_path,) = snap.live
    # row_index i holds the i-th smallest doc_id (file is doc_id-sorted
    # but NOT necessarily dense — sf1-style fixtures tile doc_id with
    # large offsets), so target indexes whose doc_id % 7 == 0.
    # GATE-SCALE ORACLE SCAFFOLDING ONLY (r11/r12 verdict note): this
    # collect builds the DV fixture's row-index INPUT at sf0.01/0.1 —
    # it is not part of the DV read/write path and must NOT be copied
    # into any sf1+ probe; production deletes arrive as positions.
    ids = [r["doc_id"] for r in
           read_delta(spark, t).select("doc_id").collect()]
    delete_rows_with_dv(
        spark, t,
        {add_path: [i for i, doc in enumerate(sorted(ids))
                    if doc % 7 == 0]})
    before = read_delta(spark, t, version=0)
    after = read_delta(spark, t)
    return (
        after.agg(
            F.count(F.lit(1)).alias("n_after"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        )
        .withColumn("n_before",
                    F.lit(before.count()).cast("bigint"))
        .withColumn("n_files",
                    F.lit(len(after.inputFiles())).cast("bigint"))
        .select("n_before", "n_after", "sum_doc_id", "total_chars",
                "n_files")
    )


@register(
    "warc2_crawl_pipeline",
    oracle=r"""
    WITH extracted AS (
      -- HTML wrap + real-parser extraction collapses to whitespace
      -- normalization for markup-free bodies (the cur5 pin)
      SELECT doc_id, lang,
             regexp_replace(trim(text), '\s+', ' ', 'g') AS text
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, text,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens
      FROM extracted
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN n_tokens >= 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quality,
           md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
               AS corpus_md5
    FROM scored
    GROUP BY lang
    """,
)
def warc2_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cur5-style end-to-end composition FROM RAW WARC BYTES: archive →
    record walk → HTTP entity decode (gzip wire form for odd docs) →
    real-parser HTML text extraction (`ext/html.py`) → token quality
    floor → per-language corpus stats, every stage the production
    operator.  The per-lang digest is order-insensitive (md5 over the
    SORTED per-doc md5s) so both engines agree without a global sort.

    At 100 TB: the walk/parse/extract stages are map-side (archive
    bytes never shuffle); the only exchanges are the doc_id join of
    extracted text back to its metadata and the final lang-keyed
    partial agg."""
    from collections.abc import Iterator

    import pandas as pd

    from tulflow_spark.ext.html import extract_text

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", "text", "lang").repartition(32))

    def to_html(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        from tulflow_spark.sources.warc import (
            encode_warc,
            iter_warc_records,
            parse_http_response,
        )

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                d = int(r["doc_id"])
                page = (f"<html><head><title>Doc {d}</title></head>"
                        f"<body><p>{r['text']}</p></body>"
                        "</html>").encode()
                if d % 2:
                    http = (b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html\r\n"
                            b"Content-Encoding: gzip\r\n\r\n"
                            + gzip.compress(page, mtime=0))
                else:
                    http = (b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html\r\n\r\n" + page)
                archive = encode_warc([{
                    "warc_type": "response",
                    "uri": f"https://w.example.org/{d}",
                    "block": http,
                    "content_type": "application/http; msgtype=response",
                }])
                (rec,) = iter_warc_records(archive)
                status, _, body = parse_http_response(rec.block)
                assert status == 200
                rows.append({"doc_id": d,
                             "html": body.decode()})
            yield pd.DataFrame(rows)

    html = docs.mapInPandas(to_html, schema="doc_id bigint, html string")
    extracted = extract_text(html, "html", "doc_id") \
        .select("doc_id", "text")
    with_lang = extracted.join(docs.select("doc_id", "lang"), "doc_id")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
    scored = with_lang.select("lang", "text", toks.alias("n_tokens"))
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("n_tokens") >= 10, 1).otherwise(0))
         .cast("bigint").alias("n_quality"),
        F.md5(F.concat_ws("", F.array_sort(
            F.collect_list(F.md5("text"))))).alias("corpus_md5"),
    )


@register(
    "dl6_column_mapping",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 5 = 2)
                AS BIGINT) AS n_pruned_rows,
           TRUE AS physical_names
    FROM documents
    """,
)
def dl6_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta column-mapping (mode=name) READ path oracle-checked: write
    documents as a bucket-partitioned mapped table (data files and
    partitionValues carry physical ``col-NNNN`` names; the metaData
    schema records logical names + ``delta.columnMapping.physicalName``
    field metadata, protocol reader 2 / writer 5), then read through
    the mapping layer.  The oracle recomputes every aggregate from the
    raw table under LOGICAL names — wrong or missed name resolution
    breaks sum/length immediately.  ``n_pruned_rows`` pins that
    ``prune=`` accepts the logical partition-column name and still
    prunes in physical space; ``physical_names`` pins that the data
    files really carry col-NNNN columns (not a no-op mapping).

    At 100 TB: mapping resolution is a metadata-only rename projection
    on top of the same grouped scan — no extra shuffle, no Python."""
    import tempfile

    from tulflow_spark.ext.delta_log import (
        read_delta,
        write_column_mapped_fixture,
    )

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .withColumn("bucket", (F.col("doc_id") % 5).cast("long")))
    t = tempfile.mkdtemp(prefix="dl6_") + "/tbl"
    write_column_mapped_fixture(spark, docs, t, partition_by=["bucket"])
    full = read_delta(spark, t)
    pruned = read_delta(spark, t, prune=("bucket", 2, 2))
    raw_cols = spark.read.parquet(full.inputFiles()[0]).columns
    physical = all(c.startswith("col-") for c in raw_cols)
    return (
        full.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        )
        .withColumn("n_pruned_rows",
                    F.lit(pruned.count()).cast("bigint"))
        .withColumn("physical_names", F.lit(bool(physical)))
        .select("n_rows", "sum_doc_id", "total_chars",
                "n_pruned_rows", "physical_names")
    )


@register(
    "ib1_iceberg_read",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_before,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST((SELECT COUNT(*) FROM documents
                 WHERE doc_id % 4 = 2 AND doc_id % 9 <> 0)
                AS BIGINT) AS n_pruned_rows
    FROM documents WHERE doc_id % 9 <> 0
    """,
)
def ib1_iceberg_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache Iceberg v2 READ path oracle-checked end-to-end: write
    documents as a bucket-partitioned Iceberg table (JSON metadata +
    Avro manifest list/manifests via the from-spec `ext/avro_ocf.py`),
    row-level-delete every doc_id % 9 == 0 via a POSITION delete file
    (merge-on-read — no data rewritten), then snapshot-read.  The
    oracle recomputes every aggregate from the raw table.  ``n_before``
    pins time travel below the delete snapshot; ``n_pruned_rows`` pins
    identity-partition pruning COMPOSED with the positional-delete
    anti-join.

    At 100 TB: the manifest walk is metadata-sized; the scan is one
    declarative parquet read over live files (pushdown intact); the
    delete set is delete-file-sized and broadcast — data never
    shuffles to apply deletes."""
    import tempfile

    import pyarrow.parquet as pq

    from tulflow_spark.ext.iceberg import (
        _live_files,
        delete_positions_iceberg_fixture,
        load_table_metadata,
        read_iceberg,
        write_iceberg_fixture,
    )

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .withColumn("bucket", (F.col("doc_id") % 4).cast("long")))
    t = tempfile.mkdtemp(prefix="ib1_") + "/tbl"
    s1 = write_iceberg_fixture(spark, docs, t, partition_by=["bucket"])
    files, _ = _live_files(load_table_metadata(t), None)
    dels = {}
    for d in files:
        ids = pq.read_table(d["file_path"][7:], columns=["doc_id"]
                            ).column("doc_id").to_pylist()
        pos = [i for i, x in enumerate(ids) if x % 9 == 0]
        if pos:
            dels[d["file_path"]] = pos
    delete_positions_iceberg_fixture(spark, t, dels)
    after = read_iceberg(spark, t)
    before_n = read_iceberg(spark, t, snapshot_id=s1).count()
    pruned_n = read_iceberg(spark, t, prune=("bucket", 2, 2)).count()
    return (
        after.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        )
        .withColumn("n_before", F.lit(before_n).cast("bigint"))
        .withColumn("n_pruned_rows", F.lit(pruned_n).cast("bigint"))
        .select("n_before", "n_rows", "sum_doc_id", "total_chars",
                "n_pruned_rows")
    )


@register(
    "ib2_iceberg_changes",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_new,
           CAST(SUM(doc_id) AS BIGINT) AS sum_new_ids,
           md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
               AS new_corpus_md5,
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_total
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def ib2_iceberg_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg incremental consumption oracle-checked: documents land
    in TWO append snapshots (doc_id % 3 != 0, then % 3 == 0);
    `read_iceberg_changes` after snapshot 1 must deliver EXACTLY the
    second batch — the oracle recomputes its count, id sum, and an
    order-insensitive corpus digest, and ``n_total`` pins that the
    full snapshot read still sees both batches.

    At 100 TB: a downstream job stores the snapshot id it has
    processed and reads O(new data) per poll instead of O(table) —
    the manifest walk selects only in-range ADDED files."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        read_iceberg,
        read_iceberg_changes,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="ib2_") + "/tbl"
    s1 = write_iceberg_fixture(
        spark, docs.filter("doc_id % 3 != 0"), t)
    append_iceberg_fixture(spark, docs.filter("doc_id % 3 = 0"), t)
    new = read_iceberg_changes(spark, t, from_snapshot_id=s1)
    total_n = read_iceberg(spark, t).count()
    return (
        new.agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum("doc_id").cast("bigint").alias("sum_new_ids"),
            F.md5(F.concat_ws("", F.array_sort(
                F.collect_list(F.md5("text"))))).alias("new_corpus_md5"),
        )
        .withColumn("n_total", F.lit(total_n).cast("bigint"))
        .select("n_new", "sum_new_ids", "new_corpus_md5", "n_total")
    )


@register(
    "sdc1_stream_delta_changes",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
               AS corpus_md5,
           CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 0
                     THEN doc_id END) AS BIGINT) AS n_even
    FROM documents
    """,
)
def sdc1_stream_delta_changes(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The Structured Streaming Delta change-feed SOURCE driven end to
    end: documents land in TWO Delta commits (odd doc_ids, then even),
    a real ``spark.readStream.format("tulflow_delta_changes")`` query
    drains both with availableNow into a memory sink, and the
    aggregates of what ARRIVED must equal the DuckDB recomputation
    over the raw table — streaming delivery == batch content, exactly
    once.

    At 100 TB: offsets are log versions (Spark's own offset log owns
    progress), planning replays only new commit JSONs, and each task
    Arrow-scans one added file — a poll is O(new data)."""
    import tempfile
    import uuid

    from tulflow_spark.ext.delta_log import write_delta
    from tulflow_spark.sources.lake_stream import DeltaChangesSource

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="sdc1_") + "/tbl"
    write_delta(docs.filter("doc_id % 2 = 1"), t)              # v0
    write_delta(docs.filter("doc_id % 2 = 0"), t,
                mode="append")                                 # v1
    spark.dataSource.register(DeltaChangesSource)
    sink = f"sdc1_{uuid.uuid4().hex[:8]}"
    q = (spark.readStream.format("tulflow_delta_changes")
         .option("path", t).option("startingVersion", "-1").load()
         .writeStream.format("memory").queryName(sink)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "sdc1 stream did not drain within 300s — partial sink "
            "contents would misreport as a correctness failure")
    arrived = spark.table(sink)
    return arrived.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.md5(F.concat_ws("", F.array_sort(
            F.collect_list(F.md5("text"))))).alias("corpus_md5"),
        F.count_distinct(
            F.when(F.col("doc_id") % 2 == 0, F.col("doc_id"))
        ).cast("bigint").alias("n_even"),
    ).select("n_rows", "sum_doc_id", "corpus_md5", "n_even")


@register(
    "sdc3_stream_delta_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    upd AS (SELECT doc_id, text FROM base
            WHERE doc_id % 5 = 0 AND doc_id % 7 <> 0),
    del2 AS (SELECT doc_id, text FROM base WHERE doc_id % 7 = 0),
    del3 AS (SELECT doc_id, text FROM base
             WHERE doc_id % 11 = 0 AND doc_id % 7 <> 0
               AND doc_id % 5 <> 0),
    ins3 AS (SELECT doc_id + 100000000 AS doc_id, 'N:' || text AS text
             FROM base WHERE doc_id % 13 = 0),
    feed AS (
      SELECT text, 'insert' AS ct,
             CASE WHEN doc_id % 2 = 1 THEN 0 ELSE 1 END AS v
      FROM base
      UNION ALL SELECT text, 'delete', 2 FROM del2
      UNION ALL SELECT text, 'update_preimage', 3 FROM upd
      UNION ALL SELECT 'M:' || text, 'update_postimage', 3 FROM upd
      UNION ALL SELECT text, 'delete', 3 FROM del3
      UNION ALL SELECT text, 'insert', 3 FROM ins3
    ),
    keyed AS (SELECT ct || '|' || md5(text) || '|' || v AS k, ct
              FROM feed)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN ct = 'delete' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_del,
           CAST(SUM(CASE WHEN ct = 'update_postimage' THEN 1 ELSE 0
                END) AS BIGINT) AS n_upd,
           md5(STRING_AGG(k, '' ORDER BY k)) AS feed_md5
    FROM keyed
    """,
)
def sdc3_stream_delta_cdf(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """The Structured Streaming CHANGE-DATA-FEED source driven end to
    end (r13, r12 VERDICT #3 — the full-fidelity sibling of sdc1,
    WITH deletes and update images): documents land in two insert
    commits, a DELETE records cdc files, and a MERGE commits paired
    update images plus inserts and deletes; a real
    ``spark.readStream.format("tulflow_delta_cdf")`` query drains all
    four versions under ``maxVersionsPerBatch=2`` admission control
    (two capped availableNow runs into a restart-capable parquet
    sink), and the digest of what ARRIVED — keyed on (change_type,
    text-hash, commit version) — must equal the DuckDB
    reconstruction of the exact change stream.  A dropped delete, an
    unpaired update image, or a re-delivered batch fails the hash.

    At 100 TB: planning parses only the range's commit JSONs; each
    task Arrow-scans one cdc/data file; the cap bounds a backlogged
    table's micro-batches; Spark's offset log owns exactly-once."""
    import tempfile

    from tulflow_spark.ext.delta_log import (
        delete_where,
        merge_delta,
        write_delta,
    )
    from tulflow_spark.sources.lake_stream import DeltaCdfSource

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="sdc3_") + "/tbl"
    write_delta(docs.filter("doc_id % 2 = 1"), t,
                configuration={"delta.enableChangeDataFeed": "true"})
    write_delta(docs.filter("doc_id % 2 = 0"), t,
                mode="append")                                 # v1
    spark.dataSource.register(DeltaCdfSource)
    out = tempfile.mkdtemp(prefix="sdc3out_")
    ckpt = tempfile.mkdtemp(prefix="sdc3ck_")

    def _start():
        return (spark.readStream.format("tulflow_delta_cdf")
                .option("path", t).option("startingVersion", "-1")
                .option("maxVersionsPerBatch", "2").load()
                .writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    def _await(q) -> None:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "sdc3 stream did not drain within 300s — partial "
                "sink contents would misreport as a correctness "
                "failure")

    # Two capped drains cover (−1,1] (1,3] exactly as before — but
    # drain 0's admission cap pins its end to version
    # min(latest, −1+2) = 1 whether v2/v3 have landed or not, so the
    # DELETE and MERGE commits land WHILE drain 0 runs (guide §2.6):
    # the per-query engine machinery (~1.3 s fixed, measured r16)
    # overlaps the DML instead of serializing behind it.  Planning for
    # (−1,1] parses only commits 0..1, so in-flight v2/v3 JSONs are
    # never read; drain 1 starts only after the merge returned, so its
    # range (1,3] is stable.  Batch contents are provably identical.
    q0 = _start()
    delete_where(spark, t, "doc_id % 7 = 0")                   # v2
    changes = (
        docs.filter("doc_id % 5 = 0 AND doc_id % 7 <> 0")
            .select("doc_id",
                    F.concat(F.lit("M:"), F.col("text")).alias("text"),
                    F.lit("U").alias("op"))
        .unionByName(
            docs.filter("doc_id % 11 = 0 AND doc_id % 7 <> 0 "
                        "AND doc_id % 5 <> 0")
                .select("doc_id", "text", F.lit("D").alias("op")))
        .unionByName(
            docs.filter("doc_id % 13 = 0")
                .select((F.col("doc_id") + 100000000).alias("doc_id"),
                        F.concat(F.lit("N:"), F.col("text"))
                         .alias("text"),
                        F.lit("I").alias("op")))
    )
    merge_delta(spark, t, changes, keys=["doc_id"])            # v3
    _await(q0)
    _await(_start())
    from tulflow_spark.io import read_parquet as _rp
    arrived = _rp(spark, out)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_version").cast("string"))
    ct = F.col("_change_type")
    return arrived.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum((ct == "delete").cast("long")).cast("bigint")
         .alias("n_del"),
        F.sum((ct == "update_postimage").cast("long")).cast("bigint")
         .alias("n_upd"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    ).select("n_rows", "n_del", "n_upd", "feed_md5")


@register(
    "sdc4_stream_iceberg_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    odd AS (SELECT * FROM base WHERE doc_id % 2 = 1),
    even AS (SELECT * FROM base WHERE doc_id % 2 = 0),
    del3 AS (SELECT * FROM base WHERE doc_id % 7 = 0),
    del4 AS (SELECT * FROM base
             WHERE doc_id % 11 = 0 AND doc_id % 7 <> 0),
    feed AS (
      SELECT text, 'insert' AS ct, 1 AS sq FROM odd
      UNION ALL SELECT text, 'insert', 2 FROM even
      UNION ALL SELECT text, 'delete', 3 FROM del3
      UNION ALL SELECT text, 'delete', 4 FROM del4
    ),
    keyed AS (SELECT ct || '|' || md5(text) || '|' || sq AS k, ct
              FROM feed)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN ct = 'delete' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_del,
           md5(STRING_AGG(k, '' ORDER BY k)) AS feed_md5
    FROM keyed
    """,
)
def sdc4_stream_iceberg_cdf(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """The Iceberg CHANGELOG STREAMING source driven end to end (r14
    — the Iceberg face of sdc3, completing streaming symmetry: both
    lake formats now stream full-fidelity change rows): odd docs land
    at sequence 1, even at 2, `delete_where_iceberg` position-deletes
    doc_id%7=0 at 3 and doc_id%11=0 at 4 (the %77 overlap is already
    dead — a second delivery fails the hash).  Two capped
    ``availableNow`` drains (maxSequencesPerBatch=2) cover (0,2] and
    (2,4] through real readStream machinery with Spark's offset log
    owning exactly-once; the digest keys on (change_type, text-hash,
    sequence).

    At 100 TB: planning is O(range snapshots) manifest walks plus
    vector-sized position-pair reads; each task Arrow-scans ONE data
    file with its positions shipped in the plan (SCALE.md §7h)."""
    import tempfile

    from tulflow_spark.ext.iceberg import delete_where_iceberg
    from tulflow_spark.sources.lake_stream import IcebergCdfSource

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="sdc4_") + "/tbl"
    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        write_iceberg_fixture,
    )

    write_iceberg_fixture(
        spark, docs.filter("doc_id % 2 = 1").coalesce(1)
        .sortWithinPartitions("doc_id"), t)                   # seq 1
    append_iceberg_fixture(
        spark, docs.filter("doc_id % 2 = 0"), t)              # seq 2
    spark.dataSource.register(IcebergCdfSource)
    out = tempfile.mkdtemp(prefix="sdc4out_")
    ckpt = tempfile.mkdtemp(prefix="sdc4ck_")

    def _start():
        return (spark.readStream.format("tulflow_iceberg_cdf")
                .option("path", t).option("startingSequence", "0")
                .option("maxSequencesPerBatch", "2").load()
                .writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    def _await(q) -> None:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "sdc4 stream did not drain within 300s — partial "
                "sink contents would misreport as a correctness "
                "failure")

    # Two capped drains cover (0,2] (2,4] exactly as before — but
    # drain 0's admission cap pins its end to sequence
    # min(latest, 0+2) = 2 whether the deletes have landed or not, so
    # both position-delete commits land WHILE drain 0 runs
    # (guide §2.6): the per-query engine machinery (~1.3 s fixed,
    # measured r16) overlaps the DML instead of serializing behind it.
    # Planning for (0,2] walks only sequence-1/2 manifests (the
    # version-hint publish is atomic, fsio.write_text_atomic, so a
    # concurrent hint read is never torn); drain 1 starts only after
    # both deletes returned, so its range (2,4] is stable.  Batch
    # contents are provably identical.
    q0 = _start()
    delete_where_iceberg(spark, t, "doc_id % 7 = 0")          # seq 3
    delete_where_iceberg(spark, t, "doc_id % 11 = 0")         # seq 4
    _await(q0)
    _await(_start())
    from tulflow_spark.io import read_parquet as _rp
    arrived = _rp(spark, out)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_seq").cast("string"))
    ct = F.col("_change_type")
    return arrived.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum((ct == "delete").cast("long")).cast("bigint")
         .alias("n_del"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    ).select("n_rows", "n_del", "feed_md5")


@register(
    "sdc5_stream_merge_cdf",
    oracle="""
    WITH odd AS (SELECT doc_id, text FROM documents
                 WHERE doc_id % 2 = 1),
    u1 AS (SELECT * FROM odd WHERE doc_id % 5 = 0),
    d1 AS (SELECT * FROM odd
           WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0),
    i1 AS (SELECT doc_id + 100000000 AS doc_id, 'N:' || text AS text
           FROM odd WHERE doc_id % 13 = 0),
    u2 AS (SELECT * FROM odd WHERE doc_id % 15 = 0),
    feed AS (
      SELECT text, 'insert' AS ct, 1 AS sq FROM odd
      UNION ALL SELECT text, 'delete', 2 FROM u1
      UNION ALL SELECT text, 'delete', 2 FROM d1
      UNION ALL SELECT 'M:' || text, 'insert', 2 FROM u1
      UNION ALL SELECT text, 'insert', 2 FROM i1
      UNION ALL SELECT 'M:' || text, 'delete', 3 FROM u2
      UNION ALL SELECT 'M2:' || text, 'insert', 3 FROM u2
    ),
    keyed AS (SELECT ct || '|' || md5(text) || '|' || sq AS k, ct
              FROM feed)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN ct = 'delete' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_del,
           md5(STRING_AGG(k, '' ORDER BY k)) AS feed_md5
    FROM keyed
    """,
)
def sdc5_stream_merge_cdf(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """merge_iceberg's OWN equality-delete output streamed through
    ``tulflow_iceberg_cdf`` (r15, r14 VERDICT #2 — the last CDC
    asymmetry closed): odd docs land at sequence 1; a merge at 2
    updates doc_id%5=0 ('M:' prefix), deletes %7 (non-%5) and inserts
    fresh %13 keys; a second merge at 3 RE-updates %15 ('M2:') — keys
    the first merge already rewrote, so its equality delete's victims
    are the first merge's OWN output rows, and the seq-1 originals
    (already dead at the predecessor) must NOT re-deliver.  One real
    ``readStream`` drain resolves all victims to positions in the
    planner (default ``maxEqualityDeleteRows``); the digest — keyed
    on (change_type, text-hash, sequence) — must equal the DuckDB
    reconstruction of the exact change stream.

    At 100 TB: planning stays O(range snapshots); equality resolution
    reads the delete files (threshold-bounded) plus the equality-key
    COLUMNS of bounds-pruned candidate files driver-side, memoized
    across the range; each task still Arrow-scans ONE data file with
    positions shipped in the plan.  Above the threshold the batch
    fails typed (compact or fall back to the batch changelog)."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        merge_iceberg,
        write_iceberg_fixture,
    )
    from tulflow_spark.sources.lake_stream import IcebergCdfSource

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    odd = docs.filter("doc_id % 2 = 1")
    t = tempfile.mkdtemp(prefix="sdc5_") + "/tbl"
    write_iceberg_fixture(
        spark, odd.coalesce(1).sortWithinPartitions("doc_id"), t)
    ch1 = (
        odd.filter("doc_id % 5 = 0")
           .select("doc_id",
                   F.concat(F.lit("M:"), F.col("text")).alias("text"),
                   F.lit("U").alias("op"))
        .unionByName(
            odd.filter("doc_id % 7 = 0 AND doc_id % 5 <> 0")
               .select("doc_id", "text", F.lit("D").alias("op")))
        .unionByName(
            odd.filter("doc_id % 13 = 0")
               .select((F.col("doc_id") + 100000000).alias("doc_id"),
                       F.concat(F.lit("N:"), F.col("text"))
                        .alias("text"),
                       F.lit("I").alias("op")))
    )
    merge_iceberg(spark, t, ch1, keys=["doc_id"])             # seq 2
    ch2 = odd.filter("doc_id % 15 = 0").select(
        "doc_id",
        F.concat(F.lit("M2:"), F.col("text")).alias("text"),
        F.lit("U").alias("op"))
    merge_iceberg(spark, t, ch2, keys=["doc_id"])             # seq 3
    spark.dataSource.register(IcebergCdfSource)
    out = tempfile.mkdtemp(prefix="sdc5out_")
    ckpt = tempfile.mkdtemp(prefix="sdc5ck_")
    q = (spark.readStream.format("tulflow_iceberg_cdf")
         .option("path", t).option("startingSequence", "0").load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "sdc5 stream did not drain within 300s — partial sink "
            "contents would misreport as a correctness failure")
    from tulflow_spark.io import read_parquet as _rp
    arrived = _rp(spark, out)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_seq").cast("string"))
    ct = F.col("_change_type")
    return arrived.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum((ct == "delete").cast("long")).cast("bigint")
         .alias("n_del"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    ).select("n_rows", "n_del", "feed_md5")


@register(
    "ic1_iceberg_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text, lang FROM documents),
    odd AS (SELECT * FROM base WHERE doc_id % 2 = 1),
    even AS (SELECT * FROM base WHERE doc_id % 2 = 0),
    posdel AS (SELECT * FROM odd WHERE doc_id % 7 = 0),
    dead AS (SELECT MIN(lang) AS lang FROM base),
    eqdel AS (
      SELECT b.* FROM base b, dead
      WHERE b.lang IS NOT DISTINCT FROM dead.lang
        AND NOT (b.doc_id % 2 = 1 AND b.doc_id % 7 = 0)
    ),
    feed AS (
      SELECT text, 'insert' AS ct, 1 AS sq FROM odd
      UNION ALL SELECT text, 'insert', 2 FROM even
      UNION ALL SELECT text, 'delete', 3 FROM posdel
      UNION ALL SELECT text, 'delete', 4 FROM eqdel
    ),
    keyed AS (SELECT ct || '|' || md5(text) || '|' || sq AS k, ct
              FROM feed)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN ct = 'delete' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_del,
           md5(STRING_AGG(k, '' ORDER BY k)) AS feed_md5
    FROM keyed
    """,
)
def ic1_iceberg_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg CHANGELOG scan oracle-checked end to end (r13:
    `read_iceberg_cdf` — the Iceberg face of the Delta change feed):
    odd docs land at sequence 1, even at 2, a POSITION delete kills
    the odd doc_id%7=0 rows at sequence 3 (positions derived from the
    id-sorted fixture file — gate-scale scaffolding, same note as
    dl5), and an EQUALITY delete kills the MIN lang value at
    sequence 4.  The feed must deliver both insert waves and both
    delete kinds — and the equality victims must EXCLUDE the rows the
    position delete already killed (alive-at-predecessor semantics;
    double delivery fails the hash).  The digest keys on
    (change_type, text-hash, sequence).

    At 100 TB: O(range snapshots) manifest walks; position victims
    are position-fetched from referenced files only; equality victims
    scan sequence-eligible files once (SCALE.md §7g)."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        _live_files,
        delete_equality_iceberg_fixture,
        delete_positions_iceberg_fixture,
        load_table_metadata,
        read_iceberg_cdf,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    t = tempfile.mkdtemp(prefix="ic1_") + "/tbl"
    odd = docs.filter("doc_id % 2 = 1").coalesce(1) \
        .sortWithinPartitions("doc_id")
    write_iceberg_fixture(spark, odd, t)                       # seq 1
    from tulflow_spark.ext.iceberg import append_iceberg_fixture

    append_iceberg_fixture(
        spark, docs.filter("doc_id % 2 = 0"), t)               # seq 2
    meta = load_table_metadata(t)
    files, _ = _live_files(meta, None)
    first = next(d["file_path"] for d in files
                 if int(d["__seq"]) == 1)
    # GATE-SCALE ORACLE SCAFFOLDING ONLY (the dl5 note): positions of
    # doc_id%7==0 within the id-sorted odd file — input construction
    # for the fixture, not a data-plane pattern
    odd_ids = sorted(r["doc_id"] for r in
                     odd.select("doc_id").collect())
    pos = [i for i, doc in enumerate(odd_ids) if doc % 7 == 0]
    delete_positions_iceberg_fixture(spark, t, {first: pos})   # seq 3
    low = docs.agg(F.min("lang")).first()[0]
    delete_equality_iceberg_fixture(
        spark, t, [{"lang": low}], ["lang"])                   # seq 4
    feed = read_iceberg_cdf(spark, t)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_seq").cast("string"))
    return feed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum((F.col("_change_type") == "delete").cast("long"))
         .cast("bigint").alias("n_del"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    ).select("n_rows", "n_del", "feed_md5")


@register(
    "ic2_merge_iceberg_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    upd AS (SELECT doc_id, text FROM base WHERE doc_id % 5 = 0),
    del AS (SELECT doc_id, text FROM base
            WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0),
    ins AS (SELECT doc_id + 100000000 AS doc_id, 'N:' || text AS text
            FROM base WHERE doc_id % 13 = 0),
    feed AS (
      SELECT text, 'insert' AS ct, 1 AS sq FROM base
      UNION ALL SELECT text, 'delete', 2 FROM upd
      UNION ALL SELECT text, 'delete', 2 FROM del
      UNION ALL SELECT 'U:' || text, 'insert', 2 FROM upd
      UNION ALL SELECT text, 'insert', 2 FROM ins
    ),
    state AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'U:' || text
                  ELSE text END AS text
      FROM base WHERE NOT (doc_id % 7 = 0 AND doc_id % 5 <> 0)
      UNION ALL SELECT doc_id, text FROM ins
    )
    SELECT
      CAST((SELECT COUNT(*) FROM feed
            WHERE ct = 'delete') AS BIGINT) AS n_del,
      CAST((SELECT COUNT(*) FROM feed
            WHERE ct = 'insert' AND sq = 2) AS BIGINT) AS n_ins,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || md5(text) || '|' || sq AS k FROM feed))
        AS feed_md5,
      CAST((SELECT COUNT(*) FROM state) AS BIGINT) AS n_state,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
         FROM state)) AS state_md5
    """,
)
def ic2_merge_iceberg_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg MERGE writer oracle-checked end to end (r14:
    `merge_iceberg` — r13 VERDICT missing #2, the dl10 recipe on the
    second lake format): documents seed the table at sequence 1, then
    ONE keyed merge commit updates every doc_id%5=0 row, deletes
    doc_id%7=0 (minus the update set), and inserts fresh doc_id+10M
    keys — committing an equality-delete file (U/D keys) plus data
    files (I/U rows) at the SAME sequence, the Flink-CDC upsert
    shape.  `read_iceberg_cdf` must deliver the matched old rows as
    ``delete`` and the I/U rows as ``insert`` at the merge's
    sequence; the post-merge state is digest-checked too, so a
    sequence-ordering bug (eq delete hiding its own inserts) fails
    even if the feed looks right.

    At 100 TB: the commit is change-set-sized (no discovery scan, no
    rewrites); readers pay one broadcast anti-join per sequence group
    until compaction folds the delete debt (SCALE.md §7g)."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        merge_iceberg,
        read_iceberg,
        read_iceberg_cdf,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="ic2_") + "/tbl"
    write_iceberg_fixture(spark, docs, t)                      # seq 1
    changes = (
        docs.filter("doc_id % 5 = 0")
            .select("doc_id",
                    F.concat(F.lit("U:"), F.col("text")).alias("text"),
                    F.lit("U").alias("op"))
        .unionByName(
            docs.filter("doc_id % 7 = 0 AND doc_id % 5 <> 0")
                .select("doc_id", "text", F.lit("D").alias("op")))
        .unionByName(
            docs.filter("doc_id % 13 = 0")
                .select((F.col("doc_id") + 100000000).alias("doc_id"),
                        F.concat(F.lit("N:"), F.col("text"))
                         .alias("text"),
                        F.lit("I").alias("op")))
    )
    merge_iceberg(spark, t, changes, keys=["doc_id"])          # seq 2
    feed = read_iceberg_cdf(spark, t)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_seq").cast("string"))
    ct = F.col("_change_type")
    agg = feed.agg(
        F.sum((ct == "delete").cast("long"))
         .cast("bigint").alias("n_del"),
        F.sum(((ct == "insert") & (F.col("_commit_seq") == 2))
              .cast("long")).cast("bigint").alias("n_ins"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    )
    srow = read_iceberg(spark, t).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("n_state",
                        F.lit(int(srow["n_state"])).cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("n_del", "n_ins", "feed_md5", "n_state",
                    "state_md5"))


@register(
    "ic3_iceberg_update_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    upd AS (SELECT doc_id, 'U:' || text AS text FROM base
            WHERE doc_id % 5 = 0),
    feed AS (
      SELECT text, 'insert' AS ct, 1 AS sq FROM base
      UNION ALL SELECT text, 'delete', 2 FROM base
                WHERE doc_id % 5 = 0
      UNION ALL SELECT text, 'insert', 2 FROM upd
      UNION ALL SELECT CASE WHEN doc_id % 5 = 0 THEN 'U:' || text
                            ELSE text END, 'delete', 3
                FROM base WHERE doc_id % 7 = 0
    ),
    state AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'U:' || text
                  ELSE text END AS text
      FROM base WHERE doc_id % 7 <> 0
    )
    SELECT
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'delete' AND sq = 2)
           AS BIGINT) AS n_upd,
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'delete' AND sq = 3)
           AS BIGINT) AS n_del,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || md5(text) || '|' || sq AS k FROM feed))
        AS feed_md5,
      CAST((SELECT COUNT(*) FROM state) AS BIGINT) AS n_state,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
         FROM state)) AS state_md5
    """,
)
def ic3_iceberg_update_cdf(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Iceberg UPDATE + DELETE writer verbs oracle-checked (r14:
    `update_where_iceberg` / `delete_where_iceberg`): documents seed
    at sequence 1; sequence 2 is ONE update snapshot (position delete
    of the doc_id%5=0 rows plus a data file carrying them with 'U:'
    prefixed — merge-on-read, no rewrite); sequence 3 position-
    deletes doc_id%7=0 — which must hit the UPDATED rows in their NEW
    file for the %35 overlap (a stale-position bug double-delivers or
    misses).  The changelog must show update-as-delete+insert at 2
    and the deletes at 3; state digest-checked.

    At 100 TB: matched-row-sized delete + data files, written
    distributed (positions never collect to the driver on v2);
    untouched files carry by reference."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        delete_where_iceberg,
        read_iceberg,
        read_iceberg_cdf,
        update_where_iceberg,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="ic3_") + "/tbl"
    write_iceberg_fixture(spark, docs, t)                      # seq 1
    update_where_iceberg(spark, t, "doc_id % 5 = 0",
                         {"text": "concat('U:', text)"})       # seq 2
    delete_where_iceberg(spark, t, "doc_id % 7 = 0")           # seq 3
    feed = read_iceberg_cdf(spark, t)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_seq").cast("string"))
    ct = F.col("_change_type")
    sq = F.col("_commit_seq")
    agg = feed.agg(
        F.sum(((ct == "delete") & (sq == 2)).cast("long"))
         .cast("bigint").alias("n_upd"),
        F.sum(((ct == "delete") & (sq == 3)).cast("long"))
         .cast("bigint").alias("n_del"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    )
    srow = read_iceberg(spark, t).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("n_state",
                        F.lit(int(srow["n_state"])).cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("n_upd", "n_del", "feed_md5", "n_state",
                    "state_md5"))


@register(
    "ic6_v3_update_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    upd AS (SELECT doc_id, 'U:' || text AS text FROM base
            WHERE doc_id % 5 = 0),
    feed AS (
      SELECT text, 'insert' AS ct, 1 AS sq FROM base
      UNION ALL SELECT text, 'delete', 2 FROM base
                WHERE doc_id % 5 = 0
      UNION ALL SELECT text, 'insert', 2 FROM upd
      UNION ALL SELECT CASE WHEN doc_id % 5 = 0 THEN 'U:' || text
                            ELSE text END, 'delete', 3
                FROM base WHERE doc_id % 7 = 0
    ),
    state AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'U:' || text
                  ELSE text END AS text
      FROM base WHERE doc_id % 7 <> 0
    )
    SELECT
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'delete' AND sq = 2)
           AS BIGINT) AS n_upd,
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'delete' AND sq = 3)
           AS BIGINT) AS n_del,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || md5(text) || '|' || sq AS k FROM feed))
        AS feed_md5,
      CAST((SELECT COUNT(*) FROM state) AS BIGINT) AS n_state,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
         FROM state)) AS state_md5
    """,
)
def ic6_v3_update_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg FORMAT-V3 UPDATE + DELETE oracle-checked (r15, r14
    VERDICT #6 — the ic3 shape on a v3 table, where position-delete
    FILES are forbidden): documents seed at sequence 1 and the table
    upgrades to v3; sequence 2 is ONE update snapshot committing a
    DELETION VECTOR (executor-side roaring-bitmap aggregation — only
    per-file bitmap bytes reach the driver) atomically WITH the data
    file carrying the doc_id%5=0 rows 'U:'-prefixed; sequence 3
    DV-deletes doc_id%7=0, which must both MERGE into the base file's
    existing DV (one live DV per file) and start a new DV on the
    update's output file for the %35 overlap.  Changelog + state
    digests must equal the v2 semantics bit for bit.

    At 100 TB: matched-row-sized DV + data files; bitmaps are
    cardinality-sized and never touch the data plane."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        delete_where_iceberg,
        read_iceberg,
        read_iceberg_cdf,
        update_where_iceberg,
        upgrade_iceberg_v3,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="ic6_") + "/tbl"
    write_iceberg_fixture(spark, docs, t)                      # seq 1
    upgrade_iceberg_v3(t)
    update_where_iceberg(spark, t, "doc_id % 5 = 0",
                         {"text": "concat('U:', text)"})       # seq 2
    delete_where_iceberg(spark, t, "doc_id % 7 = 0")           # seq 3
    feed = read_iceberg_cdf(spark, t)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_seq").cast("string"))
    ct = F.col("_change_type")
    sq = F.col("_commit_seq")
    agg = feed.agg(
        F.sum(((ct == "delete") & (sq == 2)).cast("long"))
         .cast("bigint").alias("n_upd"),
        F.sum(((ct == "delete") & (sq == 3)).cast("long"))
         .cast("bigint").alias("n_del"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    )
    srow = read_iceberg(spark, t).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("n_state",
                        F.lit(int(srow["n_state"])).cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("n_upd", "n_del", "feed_md5", "n_state",
                    "state_md5"))


@register(
    "ic4_iceberg_restore_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    dels AS (SELECT doc_id, text FROM base WHERE doc_id % 3 = 0),
    apps AS (SELECT doc_id + 100000000 AS doc_id, 'N:' || text AS text
             FROM base WHERE doc_id % 11 = 0),
    feed AS (
      SELECT text, 'insert' AS ct, 1 AS sq FROM base
      UNION ALL SELECT text, 'delete', 2 FROM dels
      UNION ALL SELECT text, 'insert', 3 FROM apps
      UNION ALL SELECT text, 'delete', 4 FROM apps
      UNION ALL SELECT text, 'insert', 4 FROM dels
    )
    SELECT
      CAST((SELECT COUNT(*) FROM feed WHERE sq = 4 AND ct = 'insert')
           AS BIGINT) AS n_resurrected,
      CAST((SELECT COUNT(*) FROM feed WHERE sq = 4 AND ct = 'delete')
           AS BIGINT) AS n_unwound,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || md5(text) || '|' || sq AS k FROM feed))
        AS feed_md5,
      CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_state,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
         FROM base)) AS state_md5
    """,
)
def ic4_iceberg_restore_cdf(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Iceberg RESTORE oracle-checked (r14: `restore_iceberg` — r13
    VERDICT missing #3, the dl13 recipe on the second format):
    documents seed at sequence 1, a position delete kills doc_id%3=0
    at 2, an append lands doc_id%11=0 clones at 3, and sequence 4 is
    ONE metadata-only rollback commit to the seed snapshot.  The
    changelog across the rollback must deliver BOTH unwind waves —
    the appended file's rows as ``delete`` (removed data file) and
    the position-deleted rows as ``insert`` (removed delete file
    resurrection); post-restore state must digest-equal the seed
    (== time-travel read).

    At 100 TB: the restore commit writes one metadata JSON — zero
    data movement; the feed's unwind stages are diff-sized."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        delete_where_iceberg,
        load_table_metadata,
        read_iceberg,
        read_iceberg_cdf,
        restore_iceberg,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="ic4_") + "/tbl"
    write_iceberg_fixture(spark, docs, t)                      # seq 1
    s1 = load_table_metadata(t)["current-snapshot-id"]
    delete_where_iceberg(spark, t, "doc_id % 3 = 0")           # seq 2
    append_iceberg_fixture(
        spark, docs.filter("doc_id % 11 = 0")
        .select((F.col("doc_id") + 100000000).alias("doc_id"),
                F.concat(F.lit("N:"), F.col("text")).alias("text")),
        t)                                                     # seq 3
    restore_iceberg(t, s1)                                     # seq 4
    feed = read_iceberg_cdf(spark, t)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_seq").cast("string"))
    ct = F.col("_change_type")
    sq = F.col("_commit_seq")
    agg = feed.agg(
        F.sum(((ct == "insert") & (sq == 4)).cast("long"))
         .cast("bigint").alias("n_resurrected"),
        F.sum(((ct == "delete") & (sq == 4)).cast("long"))
         .cast("bigint").alias("n_unwound"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    )
    srow = read_iceberg(spark, t).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("n_state",
                        F.lit(int(srow["n_state"])).cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("n_resurrected", "n_unwound", "feed_md5",
                    "n_state", "state_md5"))


@register(
    "ic5_iceberg_merge_evolve",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    upd AS (SELECT doc_id, text, doc_id * 10 AS score FROM base
            WHERE doc_id % 5 = 0),
    ins AS (SELECT doc_id + 100000000 AS doc_id, 'N:' || text AS text,
                   7 AS score
            FROM base WHERE doc_id % 13 = 0),
    feed AS (
      SELECT doc_id, CAST(NULL AS BIGINT) AS score, 'delete' AS ct
      FROM upd
      UNION ALL SELECT doc_id, score, 'insert' FROM upd
      UNION ALL SELECT doc_id, score, 'insert' FROM ins
    ),
    state AS (
      SELECT b.doc_id,
             CASE WHEN b.doc_id % 5 = 0 THEN 'U:' || b.text
                  ELSE b.text END AS text,
             u.score
      FROM base b LEFT JOIN upd u ON b.doc_id = u.doc_id
      UNION ALL SELECT doc_id, text, score FROM ins
    )
    SELECT
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'delete'
            AND score IS NULL) AS BIGINT) AS n_del_null,
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'insert')
           AS BIGINT) AS n_ins,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || CAST(doc_id AS VARCHAR) || '|' ||
                COALESCE(CAST(score AS VARCHAR), '_') AS k
         FROM feed)) AS feed_md5,
      CAST((SELECT COUNT(*) FROM state WHERE score IS NULL)
           AS BIGINT) AS n_null_score,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text || '|' ||
                    COALESCE(CAST(score AS VARCHAR), '_')) AS h
         FROM state)) AS state_md5
    """,
)
def ic5_iceberg_merge_evolve(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Iceberg MERGE schema evolution oracle-checked (r14:
    `merge_iceberg(evolve_schema=True)` — the dl14 recipe on the
    second format): documents seed at sequence 1, then ONE merge
    carries a NEW ``score`` column — updating every doc_id%5=0 row
    (score = doc_id*10) and inserting doc_id+100M clones (score = 7)
    — committing the widened schema (fresh field id, new schema-id,
    bumped last-column-id) in the same metadata as the merge
    snapshot.  Pre-existing rows must read score as NULL (field-id
    null-fill), the changelog's deletes of the matched old rows must
    carry NULL score while the inserts carry values, and the state
    digest covers the full widened rows.

    At 100 TB: evolution costs one metadata JSON — no rewrites, the
    commit stays change-set-sized."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        merge_iceberg,
        read_iceberg,
        read_iceberg_cdf,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="ic5_") + "/tbl"
    write_iceberg_fixture(spark, docs, t)                      # seq 1
    changes = (
        docs.filter("doc_id % 5 = 0")
            .select("doc_id",
                    F.concat(F.lit("U:"), F.col("text")).alias("text"),
                    (F.col("doc_id") * 10).alias("score"),
                    F.lit("U").alias("op"))
        .unionByName(
            docs.filter("doc_id % 13 = 0")
                .select((F.col("doc_id") + 100000000).alias("doc_id"),
                        F.concat(F.lit("N:"), F.col("text"))
                         .alias("text"),
                        F.lit(7).cast("long").alias("score"),
                        F.lit("I").alias("op")))
    )
    merge_iceberg(spark, t, changes, keys=["doc_id"],
                  evolve_schema=True)                          # seq 2
    feed = read_iceberg_cdf(spark, t).where("_commit_seq = 2")
    key = F.concat_ws(
        "|", F.col("_change_type"), F.col("doc_id").cast("string"),
        F.coalesce(F.col("score").cast("string"), F.lit("_")))
    ct = F.col("_change_type")
    agg = feed.agg(
        F.sum(((ct == "delete") & F.col("score").isNull())
              .cast("long")).cast("bigint").alias("n_del_null"),
        F.sum((ct == "insert").cast("long"))
         .cast("bigint").alias("n_ins"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    )
    srow = read_iceberg(spark, t).agg(
        F.sum(F.col("score").isNull().cast("long"))
         .cast("bigint").alias("n_null_score"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws(
                "|", F.col("doc_id").cast("string"), F.col("text"),
                F.coalesce(F.col("score").cast("string"),
                           F.lit("_")))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("n_null_score",
                        F.lit(int(srow["n_null_score"]))
                        .cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("n_del_null", "n_ins", "feed_md5",
                    "n_null_score", "state_md5"))


@register(
    "ib3_iceberg_eq_deletes",
    oracle="""
    WITH dead AS (SELECT MIN(lang) AS lang FROM documents),
    alive AS (
      SELECT d.* FROM documents d, dead
      WHERE d.lang IS DISTINCT FROM dead.lang
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
               AS corpus_md5,
           CAST((SELECT COUNT(*) FROM alive) + 1
                AS BIGINT) AS n_after_reappend
    FROM alive
    """,
)
def ib3_iceberg_eq_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 EQUALITY deletes oracle-checked end to end: write
    documents as an Iceberg table, equality-delete the MIN lang value
    (the Flink-CDC delete shape — values, not positions), then read.
    The oracle recomputes the surviving set in SQL.  ``n_after_reappend`` pins the SEQUENCE
    semantics: one row re-appended AFTER the delete with a deleted
    lang value must survive, so the post-append count equals the
    survivor count plus one only if the late row escaped the delete.

    At 100 TB: the delete set is values-only and broadcast; data files
    group by sequence number (a handful of frames), each anti-joined
    null-safely — no shuffle of the corpus."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        delete_equality_iceberg_fixture,
        read_iceberg,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    t = tempfile.mkdtemp(prefix="ib3_") + "/tbl"
    write_iceberg_fixture(spark, docs, t)
    dead = docs.agg(F.min("lang")).collect()[0][0]
    delete_equality_iceberg_fixture(spark, t, [{"lang": dead}], ["lang"])
    alive = read_iceberg(spark, t)
    agg = alive.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.md5(F.concat_ws("", F.array_sort(
            F.collect_list(F.md5("text"))))).alias("corpus_md5"),
    )
    # a late append with the DELETED lang survives (sequence semantics).
    # Built as a JVM literal frame: createDataFrame parallelizes one row
    # across defaultParallelism Python-served partitions, and the
    # fixture writer's single-file coalesce(1) then drains all of them
    # SERIALLY through one task's Python-worker handshakes (~6s for one
    # row, the whole ib3 hotspot); range(1) stays JVM end to end.
    late = spark.range(1).select(
        F.lit(10 ** 12).cast("long").alias("doc_id"),
        F.lit("late row").alias("text"),
        F.lit(dead).alias("lang"))
    append_iceberg_fixture(spark, late, t)
    n_after = read_iceberg(spark, t).count()
    return (agg
            .withColumn("n_after_reappend",
                        F.lit(int(n_after)).cast("bigint"))
            .select("n_rows", "sum_doc_id", "corpus_md5",
                    "n_after_reappend"))


@register(
    "ib4_iceberg_rename",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
               AS corpus_md5,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 1)
                AS BIGINT) AS n_old_vintage
    FROM documents
    """,
)
def ib4_iceberg_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg FIELD-ID column resolution oracle-checked over a
    mixed-vintage renamed table (r11 VERDICT #4): odd doc_ids land
    under the ORIGINAL column name, the column is renamed
    (new schema-id; history kept), even doc_ids land under the NEW
    name — the current-schema read must stitch both vintages by
    parquet field id (per-file rename projections), and time travel
    below the rename must still present the OLD name
    (``n_old_vintage`` counts through that path, -1 on a wrong
    column name).

    At 100 TB: resolution costs one footer read per live file
    (metadata-sized, driver-side) and groups files by projection —
    identical-layout files stay one untouched declarative scan."""
    import json as _json
    import tempfile

    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        read_iceberg,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="ib4_") + "/tbl"
    s1 = write_iceberg_fixture(spark, docs.filter("doc_id % 2 = 1"), t)
    # model the rename commit: new schema-id, old schema in history
    v = f"{t}/metadata/v1.metadata.json"
    meta = _json.load(open(v))
    cur = next(s for s in meta["schemas"]
               if s["schema-id"] == meta["current-schema-id"])
    new_schema = _json.loads(_json.dumps(cur))
    new_schema["schema-id"] = cur["schema-id"] + 1
    for f in new_schema["fields"]:
        if f["name"] == "doc_id":
            f["name"] = "document_id"
    meta["schemas"].append(new_schema)
    meta["current-schema-id"] = new_schema["schema-id"]
    _json.dump(meta, open(v, "w"))
    append_iceberg_fixture(
        spark,
        docs.filter("doc_id % 2 = 0")
            .withColumnRenamed("doc_id", "document_id"),
        t)
    got = read_iceberg(spark, t)
    old = read_iceberg(spark, t, snapshot_id=s1)
    n_old = old.count() if old.columns[0] == "doc_id" else -1
    return (
        got.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("document_id").cast("bigint").alias("sum_ids"),
            F.md5(F.concat_ws("", F.array_sort(
                F.collect_list(F.md5("text"))))).alias("corpus_md5"),
        )
        .withColumn("n_old_vintage", F.lit(int(n_old)).cast("bigint"))
        .select("n_rows", "sum_ids", "corpus_md5", "n_old_vintage")
    )


@register(
    "ib5_iceberg_v3_dv",
    oracle="""
    WITH alive AS (
      SELECT * FROM documents
      WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
               AS corpus_md5,
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_at_v1
    FROM alive
    """,
)
def ib5_iceberg_v3_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg FORMAT V3 deletion vectors oracle-checked end to end
    (r12: `ext/puffin.py` + the v3 read/write paths): write documents
    as an Iceberg table, upgrade to v3, DV-delete every ``doc_id % 7
    == 0`` row, then DV-delete every ``doc_id % 11 == 0`` row — the
    second commit MERGES into the first file-level vectors (spec: at
    most one DV per data file), so survivors must exclude both sets
    including the ``% 77`` overlap.  The oracle recomputes the
    survivor count, id sum, and an order-insensitive corpus digest;
    ``n_at_v1`` pins time travel below the deletes.

    At 100 TB: DVs are cardinality-sized roaring bitmaps in one
    Puffin sidecar per commit; the read subtracts them with a single
    broadcast anti-join on (path, row-position) — the corpus never
    shuffles, and `rewrite_iceberg_data_files` pays the debt down."""
    import tempfile

    import pyarrow.parquet as pq

    from tulflow_spark.ext.iceberg import (
        _live_files,
        delete_positions_iceberg_v3,
        load_table_metadata,
        read_iceberg,
        upgrade_iceberg_v3,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    t = tempfile.mkdtemp(prefix="ib5_") + "/tbl"
    s1 = write_iceberg_fixture(spark, docs, t)
    upgrade_iceberg_v3(t)
    files, _ = _live_files(load_table_metadata(t), None)

    def positions(mod: int) -> dict[str, list[int]]:
        # gate-scale FIXTURE construction: reads one int column per
        # data file driver-side to find the victims' row positions —
        # not a production operator (a real DV writer knows positions
        # from the scan that found the rows); keep out of sf1+ probes
        out: dict[str, list[int]] = {}
        for d in files:
            ids = pq.read_table(
                d["file_path"][7:],
                columns=["doc_id"]).column("doc_id").to_pylist()
            pos = [i for i, v in enumerate(ids) if v % mod == 0]
            if pos:
                out[d["file_path"]] = pos
        return out

    for mod in (7, 11):
        pmap = positions(mod)
        if pmap:
            delete_positions_iceberg_v3(spark, t, pmap)
    alive = read_iceberg(spark, t)
    n_at_v1 = read_iceberg(spark, t, snapshot_id=s1).count()
    return (alive.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.md5(F.concat_ws("", F.array_sort(
            F.collect_list(F.md5("text"))))).alias("corpus_md5"),
    ).withColumn("n_at_v1", F.lit(int(n_at_v1)).cast("bigint"))
     .select("n_rows", "sum_doc_id", "corpus_md5", "n_at_v1"))


@register(
    "dl7_column_mapping_id",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
               AS corpus_md5,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 5 = 3)
                AS BIGINT) AS n_pruned_rows
    FROM documents
    """,
)
def dl7_column_mapping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta column-mapping mode=id READ path oracle-checked (r11
    VERDICT #7): write documents as a bucket-partitioned mode=id table
    (physical ``col-NNNN`` footer names PLUS real parquet field ids),
    then RENAME one data file's footer columns in place keeping its
    ids — the read must stitch both footer layouts by FIELD ID under
    logical names; the oracle recomputes count, id sum and an
    order-insensitive corpus digest from the raw table, so one swapped
    or null-filled column fails the hash.  ``n_pruned_rows`` pins
    logical-name pruning over physical partitionValues.

    At 100 TB: id resolution costs one footer read per live file
    (driver-side, metadata-sized); files group by footer layout and
    each group stays one declarative scan."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tulflow_spark.ext.delta_log import (
        read_delta,
        write_column_mapped_fixture,
    )

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .withColumn("bucket", (F.col("doc_id") % 5).cast("long")))
    t = tempfile.mkdtemp(prefix="dl7_") + "/tbl"
    write_column_mapped_fixture(spark, docs, t, partition_by=["bucket"],
                                mode="id")
    # age one file: rename its footer columns, keep the field ids
    fp = sorted(read_delta(spark, t).inputFiles())[0][7:]
    tbl = pq.read_table(fp)
    renames = {"col-0000": "legacy_doc_id", "col-0001": "legacy_text"}
    fields = [pa.field(renames.get(f.name, f.name), f.type,
                       metadata=f.metadata) for f in tbl.schema]
    pq.write_table(tbl.rename_columns(
        [renames.get(n, n) for n in tbl.column_names]
    ).cast(pa.schema(fields)), fp)
    crc = os.path.join(os.path.dirname(fp),
                       f".{os.path.basename(fp)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    full = read_delta(spark, t)
    pruned_n = read_delta(spark, t, prune=("bucket", 3, 3)).count()
    return (
        full.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.md5(F.concat_ws("", F.array_sort(
                F.collect_list(F.md5("text"))))).alias("corpus_md5"),
        )
        .withColumn("n_pruned_rows", F.lit(int(pruned_n)).cast("bigint"))
        .select("n_rows", "sum_doc_id", "corpus_md5", "n_pruned_rows")
    )


@register(
    "dl8_v2_checkpoint",
    oracle="""
    WITH alive AS (
      SELECT * FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
               AS corpus_md5,
           CAST((SELECT COUNT(*) FROM alive
                 WHERE lang = (SELECT MIN(lang) FROM documents))
                AS BIGINT) AS n_min_lang
    FROM alive
    """,
)
def dl8_v2_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta V2 CHECKPOINTS oracle-checked end to end (r12:
    uuid-named checkpoint + sidecar file actions + full feature-list
    protocol row): write documents as a lang-partitioned Delta table,
    upgrade to the v2Checkpoint feature, DV-delete every ``doc_id % 5
    == 0`` row, write a V2 checkpoint, then DELETE every covered
    commit JSON (Delta log cleanup) — the read must resume entirely
    from the checkpoint: survivors, deletion vectors, partition
    columns and the reader-feature gate all come from it.
    ``n_min_lang`` pins partition pruning over the checkpoint state
    (a prune read of the MIN lang partition).

    At 100 TB: log replay after cleanup is O(commits since
    checkpoint); sidecars bound the file-listing parquet parts; the
    protocol row survives, so feature enforcement never lapses."""
    import glob as _glob
    import os as _os
    import tempfile

    import pyarrow.parquet as pq

    from tulflow_spark.ext.delta_log import (
        _replay,
        delete_rows_with_dv,
        enable_v2_checkpoints,
        read_delta,
        write_checkpoint_v2,
        write_delta,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    t = tempfile.mkdtemp(prefix="dl8_") + "/tbl"
    write_delta(docs, t, mode="append", partition_by=["lang"])
    enable_v2_checkpoints(spark, t)
    snap = _replay(spark, t, None)
    # gate-scale FIXTURE construction: find the victims' row positions
    # by reading one int column per file driver-side — not a
    # production operator; keep out of sf1+ probes
    deletes: dict[str, list[int]] = {}
    for ap in sorted(snap.live):
        ids = pq.read_table(
            f"{t}/{ap}", columns=["doc_id"]).column("doc_id").to_pylist()
        pos = [i for i, vv in enumerate(ids) if vv % 5 == 0]
        if pos:
            deletes[ap] = pos
    if deletes:
        delete_rows_with_dv(spark, t, deletes)
    cv = write_checkpoint_v2(spark, t, sidecars=2)
    for f in _glob.glob(f"{t}/_delta_log/*.json"):
        stem = _os.path.basename(f)[:-5]
        if stem.isdigit() and int(stem) <= cv:
            _os.remove(f)
    alive = read_delta(spark, t)
    min_lang = docs.agg(F.min("lang")).collect()[0][0]
    n_min = read_delta(
        spark, t, prune=("lang", min_lang, min_lang)
    ).filter(F.col("lang") == min_lang).count()
    return (alive.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.md5(F.concat_ws("", F.array_sort(
            F.collect_list(F.md5("text"))))).alias("corpus_md5"),
    ).withColumn("n_min_lang", F.lit(int(n_min)).cast("bigint"))
     .select("n_rows", "sum_doc_id", "corpus_md5", "n_min_lang"))


@register(
    "ib6_ref_travel",
    oracle="""
    WITH odd AS (SELECT * FROM documents WHERE doc_id % 2 = 1)
    SELECT CAST((SELECT COUNT(*) FROM odd) AS BIGINT) AS n_tag,
           CAST((SELECT SUM(doc_id) FROM odd) AS BIGINT) AS sum_tag,
           (SELECT md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
            FROM odd) AS tag_md5,
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_main,
           CAST((SELECT COUNT(*) FROM odd) AS BIGINT) AS n_as_of
    """,
)
def ib6_ref_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg NAMED REFS + timestamp travel oracle-checked (r12):
    odd doc_ids land in snapshot 1 which gets a TAG, even doc_ids land
    in snapshot 2; a read by tag name must pin the first snapshot
    (count, id sum, and an order-insensitive corpus digest — a tag
    that silently resolved to current would fail all three), the
    ``main`` branch must track current, and ``as_of_ms`` through the
    snapshot-log at the first commit's timestamp must land on the same
    first snapshot.

    At 100 TB: ref and timestamp resolution are metadata-dict lookups;
    the scan is the same one-declarative-scan as any snapshot read."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        load_table_metadata,
        read_iceberg,
        tag_iceberg_snapshot,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    t = tempfile.mkdtemp(prefix="ib6_") + "/tbl"
    write_iceberg_fixture(spark, docs.filter("doc_id % 2 = 1"), t)
    tag_iceberg_snapshot(t, "v1.0")
    append_iceberg_fixture(spark, docs.filter("doc_id % 2 = 0"), t)
    tagged = read_iceberg(spark, t, ref="v1.0")
    agg = tagged.agg(
        F.count(F.lit(1)).alias("n_tag"),
        F.sum("doc_id").cast("bigint").alias("sum_tag"),
        F.md5(F.concat_ws("", F.array_sort(
            F.collect_list(F.md5("text"))))).alias("tag_md5"),
    )
    n_main = read_iceberg(spark, t, ref="main").count()
    ts1 = load_table_metadata(t)["snapshot-log"][0]["timestamp-ms"]
    n_as_of = read_iceberg(spark, t, as_of_ms=ts1).count()
    return (agg
            .withColumn("n_main", F.lit(int(n_main)).cast("bigint"))
            .withColumn("n_as_of", F.lit(int(n_as_of)).cast("bigint"))
            .select("n_tag", "sum_tag", "tag_md5", "n_main",
                    "n_as_of"))


@register(
    "dl9_change_feed",
    oracle="""
    WITH changes AS (
      SELECT doc_id, text, 'insert' AS ct,
             CASE WHEN doc_id % 2 = 1 THEN 0 ELSE 1 END AS v
      FROM documents
      UNION ALL
      SELECT doc_id, text, 'delete', 2 FROM documents
      WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id, text, 'delete', 3 FROM documents
      WHERE doc_id % 11 = 0 AND doc_id % 7 <> 0
    )
    SELECT CAST(SUM(CASE WHEN ct = 'insert' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_insert,
           CAST(SUM(CASE WHEN ct = 'delete' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_delete,
           CAST(SUM(CASE WHEN ct = 'delete' THEN doc_id END)
                AS BIGINT) AS sum_deleted,
           md5(STRING_AGG(ct || '|' || md5(text) || '|' || v, ''
               ORDER BY ct || '|' || md5(text) || '|' || v))
               AS cdf_md5
    FROM changes
    """,
)
def dl9_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta CHANGE DATA FEED oracle-checked end to end (r12:
    `read_delta_cdf`): documents land in two insert commits (odd then
    even doc_ids), then two DELETE commits whose row-level changes are
    recorded in protocol ``cdc`` files under ``_change_data/``
    (``delta.enableChangeDataFeed`` duty of ``delete_where``); the
    feed must deliver every insert AND every delete with its commit
    version — the oracle reconstructs the exact change stream in SQL
    and the digest keys on (change_type, text-hash, version), so a
    missed delete, a double-delivered insert, or a wrong version
    fails the hash.  Note the second delete's victims exclude rows
    the first already removed (CDF reflects actual state
    transitions, not predicates).

    At 100 TB: each version contributes only ITS cdc/add files —
    never a table scan; deletes ride change-sized cdc parquet."""
    import tempfile

    from tulflow_spark.ext.delta_log import (
        delete_where,
        read_delta_cdf,
        write_delta,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    t = tempfile.mkdtemp(prefix="dl9_") + "/tbl"
    write_delta(docs.filter("doc_id % 2 = 1"), t, mode="append",
                configuration={"delta.enableChangeDataFeed": "true"})
    write_delta(docs.filter("doc_id % 2 = 0"), t, mode="append")
    delete_where(spark, t, "doc_id % 7 = 0")
    delete_where(spark, t, "doc_id % 11 = 0")
    cdf = read_delta_cdf(spark, t, -1)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_version").cast("string"))
    is_del = F.col("_change_type") == "delete"
    return cdf.agg(
        F.sum(F.when(~is_del, 1).otherwise(0))
         .cast("bigint").alias("n_insert"),
        F.sum(F.when(is_del, 1).otherwise(0))
         .cast("bigint").alias("n_delete"),
        F.sum(F.when(is_del, F.col("doc_id")))
         .cast("bigint").alias("sum_deleted"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("cdf_md5"),
    ).select("n_insert", "n_delete", "sum_deleted", "cdf_md5")


@register(
    "dl10_merge_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    upd AS (SELECT doc_id, text FROM base WHERE doc_id % 5 = 0),
    del AS (SELECT doc_id, text FROM base
            WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0),
    ins AS (SELECT doc_id + 100000000 AS doc_id, 'N:' || text AS text
            FROM base WHERE doc_id % 13 = 0),
    feed AS (
      SELECT doc_id, text, 'insert' AS ct, 0 AS v FROM base
      UNION ALL SELECT doc_id, text, 'update_preimage', 1 FROM upd
      UNION ALL SELECT doc_id, 'U:' || text, 'update_postimage', 1
                FROM upd
      UNION ALL SELECT doc_id, text, 'delete', 1 FROM del
      UNION ALL SELECT doc_id, text, 'insert', 1 FROM ins
    ),
    state AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'U:' || text
                  ELSE text END AS text
      FROM base WHERE NOT (doc_id % 7 = 0 AND doc_id % 5 <> 0)
      UNION ALL SELECT doc_id, text FROM ins
    )
    SELECT
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'update_preimage')
           AS BIGINT) AS n_pre,
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'delete')
           AS BIGINT) AS n_del,
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'insert' AND v = 1)
           AS BIGINT) AS n_ins,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || md5(text) || '|' || v AS k FROM feed))
        AS feed_md5,
      CAST((SELECT COUNT(*) FROM state) AS BIGINT) AS n_state,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
         FROM state)) AS state_md5
    """,
)
def dl10_merge_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta MERGE with Change-Data-Feed images oracle-checked (r13:
    `merge_delta` — r12 VERDICT missing #2): documents seed the table
    (CDF on), then ONE keyed MERGE commit updates every doc_id%5=0
    row, deletes doc_id%7=0 (minus the update set — each key carries
    one op), and inserts fresh doc_id+10M keys.  The feed must carry
    paired ``update_preimage``/``update_postimage`` rows for the
    updates, ``delete`` rows for exactly the removed rows, and
    ``insert`` rows for the new keys, all at the merge's commit
    version; the final table state is digest-checked too, so a wrong
    rewrite (dropped keeper, double-applied change) fails even if the
    feed looks right.  The oracle reconstructs both the change stream
    and the post-merge state in pure SQL.

    At 100 TB: key-match discovery is a column-pruned key scan with
    the change keys broadcast; only matched files rewrite; every cdc
    stage is change-set-sized (SCALE.md §7g)."""
    import tempfile

    from tulflow_spark.ext.delta_log import (
        merge_delta,
        read_delta,
        read_delta_cdf,
        write_delta,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="dl10_") + "/tbl"
    write_delta(docs, t, mode="append",
                configuration={"delta.enableChangeDataFeed": "true"})
    changes = (
        docs.filter("doc_id % 5 = 0")
            .select("doc_id",
                    F.concat(F.lit("U:"), F.col("text")).alias("text"),
                    F.lit("U").alias("op"))
        .unionByName(
            docs.filter("doc_id % 7 = 0 AND doc_id % 5 <> 0")
                .select("doc_id", "text", F.lit("D").alias("op")))
        .unionByName(
            docs.filter("doc_id % 13 = 0")
                .select((F.col("doc_id") + 100000000).alias("doc_id"),
                        F.concat(F.lit("N:"), F.col("text"))
                         .alias("text"),
                        F.lit("I").alias("op")))
    )
    merge_delta(spark, t, changes, keys=["doc_id"])
    feed = read_delta_cdf(spark, t, -1)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_version").cast("string"))
    ct = F.col("_change_type")
    agg = feed.agg(
        F.sum((ct == "update_preimage").cast("long"))
         .cast("bigint").alias("n_pre"),
        F.sum((ct == "delete").cast("long"))
         .cast("bigint").alias("n_del"),
        F.sum(((ct == "insert") & (F.col("_commit_version") == 1))
              .cast("long")).cast("bigint").alias("n_ins"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    )
    state = read_delta(spark, t)
    srow = state.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("n_state",
                        F.lit(int(srow["n_state"])).cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("n_pre", "n_del", "n_ins", "feed_md5", "n_state",
                    "state_md5"))


@register(
    "dl14_merge_evolve_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    upd AS (SELECT doc_id, text, doc_id * 10 AS score FROM base
            WHERE doc_id % 5 = 0),
    ins AS (SELECT doc_id + 100000000 AS doc_id, 'N:' || text AS text,
                   7 AS score
            FROM base WHERE doc_id % 13 = 0),
    feed AS (
      SELECT doc_id, NULL AS score, 'update_preimage' AS ct FROM upd
      UNION ALL SELECT doc_id, score, 'update_postimage' FROM upd
      UNION ALL SELECT doc_id, score, 'insert' FROM ins
    ),
    state AS (
      SELECT b.doc_id,
             CASE WHEN b.doc_id % 5 = 0 THEN 'U:' || b.text
                  ELSE b.text END AS text,
             u.score
      FROM base b LEFT JOIN upd u ON b.doc_id = u.doc_id
      UNION ALL SELECT doc_id, text, score FROM ins
    )
    SELECT
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'update_preimage'
            AND score IS NULL) AS BIGINT) AS n_pre_null,
      CAST((SELECT COUNT(*) FROM feed WHERE ct = 'update_postimage')
           AS BIGINT) AS n_post,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || CAST(doc_id AS VARCHAR) || '|' ||
                COALESCE(CAST(score AS VARCHAR), '_') AS k
         FROM feed)) AS feed_md5,
      CAST((SELECT COUNT(*) FROM state WHERE score IS NULL)
           AS BIGINT) AS n_null_score,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text || '|' ||
                    COALESCE(CAST(score AS VARCHAR), '_')) AS h
         FROM state)) AS state_md5
    """,
)
def dl14_merge_evolve_cdf(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Delta MERGE schema evolution oracle-checked (r14:
    `merge_delta(evolve_schema=True)` — r13 VERDICT missing #5, the
    delta-spark withSchemaEvolution() shape): documents seed the
    table (CDF on), then ONE merge carries a NEW nullable ``score``
    column — updating every doc_id%5=0 row (score = doc_id*10) and
    inserting doc_id+10M clones (score = 7) — committing the widened
    metaData in the same version.  Pre-existing rows must read score
    as NULL, the feed's preimages must carry NULL score while
    postimages carry the new values, and the state digest covers the
    full widened rows.

    At 100 TB: evolution costs one metaData action — no file
    rewrites beyond the merge's own matched files."""
    import tempfile

    from tulflow_spark.ext.delta_log import (
        merge_delta,
        read_delta,
        read_delta_cdf,
        write_delta,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="dl14_") + "/tbl"
    write_delta(docs, t, mode="append",
                configuration={"delta.enableChangeDataFeed": "true"})
    changes = (
        docs.filter("doc_id % 5 = 0")
            .select("doc_id",
                    F.concat(F.lit("U:"), F.col("text")).alias("text"),
                    (F.col("doc_id") * 10).alias("score"),
                    F.lit("U").alias("op"))
        .unionByName(
            docs.filter("doc_id % 13 = 0")
                .select((F.col("doc_id") + 100000000).alias("doc_id"),
                        F.concat(F.lit("N:"), F.col("text"))
                         .alias("text"),
                        F.lit(7).cast("long").alias("score"),
                        F.lit("I").alias("op")))
    )
    v = merge_delta(spark, t, changes, keys=["doc_id"],
                    evolve_schema=True)
    feed = read_delta_cdf(spark, t, v - 1, v)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.col("doc_id").cast("string"),
        F.coalesce(F.col("score").cast("string"), F.lit("_")))
    ct = F.col("_change_type")
    agg = feed.agg(
        F.sum(((ct == "update_preimage") & F.col("score").isNull())
              .cast("long")).cast("bigint").alias("n_pre_null"),
        F.sum((ct == "update_postimage").cast("long"))
         .cast("bigint").alias("n_post"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    )
    state = read_delta(spark, t)
    srow = state.agg(
        F.sum(F.col("score").isNull().cast("long"))
         .cast("bigint").alias("n_null_score"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws(
                "|", F.col("doc_id").cast("string"), F.col("text"),
                F.coalesce(F.col("score").cast("string"),
                           F.lit("_")))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("n_null_score",
                        F.lit(int(srow["n_null_score"]))
                        .cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("n_pre_null", "n_post", "feed_md5",
                    "n_null_score", "state_md5"))


@register(
    "dl11_cdf_rename",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    feed AS (
      SELECT text, 'insert' AS ct,
             CASE WHEN doc_id % 2 = 1 THEN 0 ELSE 1 END AS v
      FROM base
      UNION ALL
      SELECT text, 'update_preimage', 3 FROM base WHERE doc_id % 5 = 0
      UNION ALL
      SELECT 'R:' || text, 'update_postimage', 3 FROM base
      WHERE doc_id % 5 = 0
    ),
    keyed AS (SELECT ct || '|' || md5(text) || '|' || v AS k, ct
              FROM feed)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN ct LIKE 'update%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_upd,
           md5(STRING_AGG(k, '' ORDER BY k)) AS feed_md5
    FROM keyed
    """,
)
def dl11_cdf_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed over a COLUMN-MAPPED (mode=name) Delta table
    crossing a mid-history RENAME (r13, r12 VERDICT missing #4):
    odd docs land at v0 through the mapped fixture writer, even docs
    via a foreign-shaped physical-named append (v1), a metaData
    commit renames ``text``→``body`` (v2, contributes nothing to the
    feed), and a foreign cdc commit records update images for
    doc_id%5=0 (v3).  `read_delta_cdf` must resolve every vintage in
    PHYSICAL name space and deliver the whole feed under the current
    logical name — the oracle reconstructs the change stream in SQL
    and the digest keys on (change_type, text-hash, version), so a
    misresolved physical column (silent NULLs) or a dropped vintage
    fails the hash.

    At 100 TB: identical per-version file-sized reads as dl9; the
    rename costs one metadata action, never a rewrite."""
    import tempfile

    from tulflow_spark.ext.delta_log import (
        _publish,
        _stage_adds,
        _stage_cdc,
        read_delta_cdf,
        write_column_mapped_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="dl11_") + "/tbl"
    write_column_mapped_fixture(
        spark, docs.filter("doc_id % 2 = 1"), t)              # v0
    phys = docs.filter("doc_id % 2 = 0").select(
        F.col("doc_id").alias("col-0000"),
        F.col("text").alias("col-0001"))
    _publish(t, 1, _stage_adds(phys, t, None))                # v1
    import json as _json

    from pathlib import Path as _Path

    v0 = [_json.loads(ln)
          for ln in _Path(
              f"{t}/_delta_log/{0:020d}.json").read_text().splitlines()
          if ln.strip()]
    meta = next(a["metaData"] for a in v0 if a.get("metaData"))
    sch = _json.loads(meta["schemaString"])
    assert sch["fields"][1]["name"] == "text"
    sch["fields"][1]["name"] = "body"
    _publish(t, 2, [{"metaData": dict(
        meta, schemaString=_json.dumps(sch))}])               # v2
    upd = docs.filter("doc_id % 5 = 0")
    pre = upd.select(F.col("doc_id").alias("col-0000"),
                     F.col("text").alias("col-0001"))
    post = upd.select(
        F.col("doc_id").alias("col-0000"),
        F.concat(F.lit("R:"), F.col("text")).alias("col-0001"))
    _publish(t, 3,
             _stage_cdc(pre, t, "update_preimage")
             + _stage_cdc(post, t, "update_postimage"))       # v3
    feed = read_delta_cdf(spark, t, -1)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("body"),
        F.col("_commit_version").cast("string"))
    return feed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("_change_type").startswith("update")
              .cast("long")).cast("bigint").alias("n_upd"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    ).select("n_rows", "n_upd", "feed_md5")


@register(
    "dl12_update_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    upd AS (SELECT doc_id, text FROM base WHERE doc_id % 5 = 0),
    feed AS (
      SELECT text, 'insert' AS ct, 0 AS v FROM base
      UNION ALL SELECT text, 'update_preimage', 1 FROM upd
      UNION ALL SELECT 'E:' || text, 'update_postimage', 1 FROM upd
    ),
    state AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'E:' || text
                  ELSE text END AS text
      FROM base
    ),
    keyed AS (SELECT ct || '|' || md5(text) || '|' || v AS k FROM feed)
    SELECT CAST((SELECT COUNT(*) FROM upd) AS BIGINT) AS n_upd,
           (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM keyed)
             AS feed_md5,
           (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
             (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
              FROM state)) AS state_md5
    """,
)
def dl12_update_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta UPDATE with Change-Data-Feed images oracle-checked (r13:
    `update_where` — the third DML verb beside delete_where and
    merge_delta): documents seed the table (CDF on), one UPDATE
    commit rewrites every doc_id%5=0 row through a SET expression
    evaluated against the pre-update row; the feed must carry paired
    ``update_preimage``/``update_postimage`` rows at the commit
    version and the post-update state is digest-checked too, so a
    double-applied expression or a dropped keeper fails even if the
    feed looks right.

    At 100 TB: the match scan is declarative (pushdown decides which
    files read); only matched files rewrite; cdc stages are
    matched-row-sized (SCALE.md §7g)."""
    import tempfile

    from tulflow_spark.ext.delta_log import (
        read_delta,
        read_delta_cdf,
        update_where,
        write_delta,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="dl12_") + "/tbl"
    write_delta(docs, t, mode="append",
                configuration={"delta.enableChangeDataFeed": "true"})
    update_where(spark, t, "doc_id % 5 = 0",
                 {"text": "concat('E:', text)"})
    feed = read_delta_cdf(spark, t, -1)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_version").cast("string"))
    n_upd = feed.where(
        "_change_type = 'update_postimage'").count()
    srow = read_delta(spark, t).agg(
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (feed.agg(
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"))
        .withColumn("n_upd", F.lit(int(n_upd)).cast("bigint"))
        .withColumn("state_md5", F.lit(srow["state_md5"]))
        .select("n_upd", "feed_md5", "state_md5"))


@register(
    "dl13_restore_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    extra AS (SELECT doc_id + 100000000 AS doc_id, 'N:' || text AS text
              FROM base WHERE doc_id % 13 = 0),
    feed AS (
      SELECT text, 'insert' AS ct, 0 AS v FROM base
      UNION ALL SELECT text, 'insert', 1 FROM extra
      UNION ALL SELECT text, 'delete', 2 FROM extra
    ),
    keyed AS (SELECT ct || '|' || md5(text) || '|' || v AS k FROM feed)
    SELECT CAST((SELECT COUNT(*) FROM extra) AS BIGINT) AS n_undone,
           (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM keyed)
             AS feed_md5,
           (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
             (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
              FROM base)) AS state_md5
    """,
)
def dl13_restore_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta RESTORE oracle-checked (r13: `restore_delta`): documents
    seed the table (CDF on), an append lands extra rows, and a RESTORE
    to version 0 undoes it in ONE reference-moving commit — the feed
    must record the undone rows as ``delete`` at the restore's
    version (cdc staged by the writer), and the post-restore state
    must digest-equal the original corpus (a restore that rewrote or
    dropped an original file fails the state hash).

    At 100 TB: the restore diff is log-metadata-sized; only the
    undone files' rows ride cdc parquet."""
    import tempfile

    from tulflow_spark.ext.delta_log import (
        read_delta,
        read_delta_cdf,
        restore_delta,
        write_delta,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="dl13_") + "/tbl"
    write_delta(docs, t, mode="append",
                configuration={"delta.enableChangeDataFeed": "true"})
    extra = docs.filter("doc_id % 13 = 0").select(
        (F.col("doc_id") + 100000000).alias("doc_id"),
        F.concat(F.lit("N:"), F.col("text")).alias("text"))
    write_delta(extra, t, mode="append")                       # v1
    v = restore_delta(spark, t, 0)                             # v2
    feed = read_delta_cdf(spark, t, -1)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_version").cast("string"))
    n_undone = feed.where(
        (F.col("_change_type") == "delete")
        & (F.col("_commit_version") == v)).count()
    srow = read_delta(spark, t).agg(
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (feed.agg(
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"))
        .withColumn("n_undone", F.lit(int(n_undone)).cast("bigint"))
        .withColumn("state_md5", F.lit(srow["state_md5"]))
        .select("n_undone", "feed_md5", "state_md5"))


@register(
    "sdc2_stream_iceberg_changes",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           md5(STRING_AGG(md5(text), '' ORDER BY md5(text)))
               AS corpus_md5,
           CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 0
                     THEN doc_id END) AS BIGINT) AS n_even
    FROM documents
    """,
)
def sdc2_stream_iceberg_changes(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The Structured Streaming ICEBERG change-feed SOURCE driven end
    to end (the sequence-number twin of sdc1): documents land in TWO
    Iceberg append snapshots (odd doc_ids, then even), a real
    ``spark.readStream.format("tulflow_iceberg_changes")`` query
    drains both with availableNow under ``maxSequencesPerBatch=1``
    admission control into a memory sink, and the aggregates of what
    ARRIVED must equal the DuckDB recomputation over the raw table —
    capped streaming delivery == batch content, exactly once.

    At 100 TB: offsets are sequence numbers (snapshot ids are random
    longs and never ordered), planning walks only in-range manifests,
    each task Arrow-scans one added file, and the cap bounds what one
    micro-batch may cover on a backlogged table."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        append_iceberg_fixture,
        write_iceberg_fixture,
    )
    from tulflow_spark.sources.lake_stream import IcebergChangesSource

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="sdc2_") + "/tbl"
    write_iceberg_fixture(spark, docs.filter("doc_id % 2 = 1"), t)
    spark.dataSource.register(IcebergChangesSource)
    out = tempfile.mkdtemp(prefix="sdc2out_")
    ckpt = tempfile.mkdtemp(prefix="sdc2ck_")

    # two capped availableNow drains: each covers ONE sequence (the
    # memory sink cannot recover from a checkpoint — parquet can)
    def _drain() -> None:
        q = (spark.readStream.format("tulflow_iceberg_changes")
             .option("path", t).option("startingSequence", "0")
             .option("maxSequencesPerBatch", "1").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "sdc2 stream did not drain within 300s — partial "
                "sink contents would misreport as a correctness "
                "failure")

    # Drain 0's admission cap pins its end offset to sequence
    # min(latest, 0+1) = 1 whether or not sequence 2 has landed, so
    # the second append commits WHILE drain 0 runs (guide §2.6): the
    # per-query engine machinery (query start, Python source-runner
    # spawn, micro-batch lifecycle — ~1.3 s fixed, measured r16)
    # overlaps the append instead of serializing behind it.  Batch
    # contents are provably identical; drain 1 starts only after both
    # the append and drain 0 have finished, exactly as before.
    q0 = (spark.readStream.format("tulflow_iceberg_changes")
          .option("path", t).option("startingSequence", "0")
          .option("maxSequencesPerBatch", "1").load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    append_iceberg_fixture(spark, docs.filter("doc_id % 2 = 0"), t)
    if not q0.awaitTermination(300):
        q0.stop()
        raise TimeoutError(
            "sdc2 stream did not drain within 300s — partial "
            "sink contents would misreport as a correctness "
            "failure")
    _drain()
    from tulflow_spark.io import read_parquet as _rp
    arrived = _rp(spark, out)
    return arrived.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.md5(F.concat_ws("", F.array_sort(
            F.collect_list(F.md5("text"))))).alias("corpus_md5"),
        F.count_distinct(
            F.when(F.col("doc_id") % 2 == 0, F.col("doc_id"))
        ).cast("bigint").alias("n_even"),
    ).select("n_rows", "sum_doc_id", "corpus_md5", "n_even")


@register(
    "ic7_convert_eq_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    u1 AS (SELECT doc_id FROM base WHERE doc_id % 5 = 0),
    d1 AS (SELECT doc_id FROM base
           WHERE doc_id % 11 = 0 AND doc_id % 5 <> 0),
    s1 AS (SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN 'U:' || text
                       ELSE text END AS text
           FROM base
           WHERE NOT (doc_id % 11 = 0 AND doc_id % 5 <> 0)),
    u2 AS (SELECT doc_id FROM s1 WHERE doc_id % 7 = 0),
    s2 AS (SELECT doc_id,
                  CASE WHEN doc_id % 7 = 0 THEN 'W:' || text
                       ELSE text END AS text
           FROM s1),
    d3 AS (SELECT doc_id, text FROM s2 WHERE doc_id % 3 = 0),
    s3 AS (SELECT doc_id, text FROM s2 WHERE doc_id % 3 <> 0),
    feed AS (
      SELECT text, 'insert' AS ct, 1 AS sq FROM base
      UNION ALL SELECT b.text, 'delete', 2
                FROM base b JOIN u1 USING (doc_id)
      UNION ALL SELECT 'U:' || b.text, 'insert', 2
                FROM base b JOIN u1 USING (doc_id)
      UNION ALL SELECT b.text, 'delete', 2
                FROM base b JOIN d1 USING (doc_id)
      UNION ALL SELECT s.text, 'delete', 3
                FROM s1 s JOIN u2 USING (doc_id)
      UNION ALL SELECT 'W:' || s.text, 'insert', 3
                FROM s1 s JOIN u2 USING (doc_id)
      UNION ALL SELECT text, 'delete', 5 FROM d3
    )
    SELECT
      CAST(0 AS BIGINT) AS eq_files_after,
      CAST((SELECT COUNT(*) FROM feed) AS BIGINT) AS n_feed,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || md5(text) || '|' || sq AS k FROM feed))
        AS feed_md5,
      CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_state,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
         FROM s3)) AS state_md5
    """,
)
def ic7_convert_eq_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality→position delete CONVERSION oracle-checked (r15 minor
    compaction): documents seed at sequence 1; two merge_iceberg
    commits accrue equality-delete debt (seq 2 'U:'-updates doc_id%5
    and deletes %11, seq 3 'W:'-updates %7 of the then-current
    state); ``convert_eq_deletes_iceberg`` materializes every victim
    as position deletes and retires the eq files in ONE ``replace``
    snapshot (seq 4 — row-preserving, so the changelog must NOT see
    it, and ``eq_files_after`` must hit the oracle's literal 0); then
    ``delete_where_iceberg`` removes %3 (seq 5) — position DML that
    REFUSES typed over live equality deletes, so its presence in the
    digest proves the conversion actually unblocked it.  Feed and
    final-state digests must match DuckDB's reconstruction bit for
    bit.

    At 100 TB: conversion is victim-sized (one position-tagged scan
    of the eq deletes' candidate files, no data rewrite) — the cheap
    maintenance step that keeps a merge_iceberg CDC feed readable.
    Cf. reference `tulflow` (no lake-format surface); Iceberg spec
    §Row-level deletes."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        convert_eq_deletes_iceberg,
        delete_where_iceberg,
        iceberg_delete_debt,
        merge_iceberg,
        read_iceberg,
        read_iceberg_cdf,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="ic7_") + "/tbl"
    write_iceberg_fixture(spark, docs, t)                      # seq 1
    ch1 = (docs.where("doc_id % 5 = 0")
           .select("doc_id",
                   F.concat(F.lit("U:"), F.col("text")).alias("text"),
                   F.lit("U").alias("op"))
           .unionByName(
               docs.where("doc_id % 11 = 0 AND doc_id % 5 <> 0")
               .select("doc_id", "text", F.lit("D").alias("op"))))
    merge_iceberg(spark, t, ch1, ["doc_id"])                   # seq 2
    cur = read_iceberg(spark, t)
    ch2 = (cur.where("doc_id % 7 = 0")
           .select("doc_id",
                   F.concat(F.lit("W:"), F.col("text")).alias("text"),
                   F.lit("U").alias("op")))
    merge_iceberg(spark, t, ch2, ["doc_id"])                   # seq 3
    convert_eq_deletes_iceberg(spark, t)             # seq 4, replace
    eq_after = int(iceberg_delete_debt(t)["eq_delete_files"])
    delete_where_iceberg(spark, t, "doc_id % 3 = 0")           # seq 5
    feed = read_iceberg_cdf(spark, t)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_seq").cast("string"))
    agg = feed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_feed"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"),
    )
    srow = read_iceberg(spark, t).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("eq_files_after",
                        F.lit(eq_after).cast("bigint"))
            .withColumn("n_state",
                        F.lit(int(srow["n_state"])).cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("eq_files_after", "n_feed", "feed_md5",
                    "n_state", "state_md5"))


@register(
    "ic8_pos_rewrite_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    d1 AS (SELECT doc_id, text FROM base WHERE doc_id % 7 = 0),
    d2 AS (SELECT doc_id, text FROM base
           WHERE doc_id % 7 <> 0 AND doc_id % 11 = 0),
    d3 AS (SELECT doc_id, text FROM base
           WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 0
             AND doc_id % 13 = 0),
    s AS (SELECT doc_id, text FROM base
          WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 0
            AND doc_id % 13 <> 0),
    feed AS (
      SELECT text, 'insert' AS ct, 1 AS sq FROM base
      UNION ALL SELECT text, 'delete', 2 FROM d1
      UNION ALL SELECT text, 'delete', 3 FROM d2
      UNION ALL SELECT text, 'delete', 4 FROM d3
    )
    SELECT
      CAST(1 AS BIGINT) AS n_pos_files,
      CAST((SELECT COUNT(*) FROM d1) +
           (SELECT COUNT(*) FROM d2) +
           (SELECT COUNT(*) FROM d3) AS BIGINT) AS n_del_rows,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || md5(text) || '|' || sq AS k FROM feed))
        AS feed_md5,
      CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_state,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
         FROM s)) AS state_md5
    """,
)
def ic8_pos_rewrite_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-delete CONSOLIDATION oracle-checked (r15, the
    ``rewrite_position_delete_files`` action analog): documents seed
    at sequence 1; three ``delete_where_iceberg`` commits (doc_id%7,
    then %11, then %13 of the survivors) leave three position-delete
    files; ``rewrite_position_deletes_iceberg`` folds them into ONE
    (``n_pos_files`` hits the oracle's literal 1, ``n_del_rows``
    pins the deduped pair count) in a row-preserving ``replace``
    snapshot the changelog must NOT see — feed and state digests
    must match DuckDB's reconstruction bit for bit.

    At 100 TB: consolidation is delete-plane-sized (pairs shuffle
    once by target file, the data plane is never read) — what keeps
    a long-lived merge-on-read table's per-read anti-join O(targeted
    files) instead of O(DML history).  Cf. reference `tulflow` (no
    lake-format surface); Iceberg spec §Position-delete files."""
    import tempfile

    from tulflow_spark.ext.iceberg import (
        _live_files,
        delete_where_iceberg,
        load_table_metadata,
        read_iceberg,
        read_iceberg_cdf,
        rewrite_position_deletes_iceberg,
        write_iceberg_fixture,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="ic8_") + "/tbl"
    write_iceberg_fixture(spark, docs, t)                      # seq 1
    delete_where_iceberg(spark, t, "doc_id % 7 = 0")           # seq 2
    delete_where_iceberg(spark, t, "doc_id % 11 = 0")          # seq 3
    delete_where_iceberg(spark, t, "doc_id % 13 = 0")          # seq 4
    rewrite_position_deletes_iceberg(spark, t)       # seq 5, replace
    _, dels = _live_files(load_table_metadata(t), None)
    n_pos = len({str(d["file_path"]) for d in dels
                 if int(d.get("content") or 0) == 1})
    n_del_rows = sum(int(d.get("record_count") or 0) for d in dels)
    feed = read_iceberg_cdf(spark, t)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_seq").cast("string"))
    agg = feed.agg(
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"))
    srow = read_iceberg(spark, t).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("n_pos_files", F.lit(n_pos).cast("bigint"))
            .withColumn("n_del_rows",
                        F.lit(n_del_rows).cast("bigint"))
            .withColumn("n_state",
                        F.lit(int(srow["n_state"])).cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("n_pos_files", "n_del_rows", "feed_md5",
                    "n_state", "state_md5"))


@register(
    "dl15_dv_purge_cdf",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    dead AS (SELECT doc_id, text FROM base WHERE doc_id % 7 = 0),
    s AS (SELECT doc_id, text FROM base WHERE doc_id % 7 <> 0),
    feed AS (
      -- read_delta_cdf(from=0) is (0, to]: v0's creation inserts are
      -- before the window; v1 is the DV delete; v2 (the purge) is
      -- layout-only and must contribute NOTHING
      SELECT text, 'delete' AS ct, 1 AS v FROM dead
    )
    SELECT
      CAST(0 AS BIGINT) AS n_dv_after,
      CAST(1 AS BIGINT) AS n_files_after,
      (SELECT md5(STRING_AGG(k, '' ORDER BY k)) FROM
        (SELECT ct || '|' || md5(text) || '|' || v AS k FROM feed))
        AS feed_md5,
      CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_state,
      (SELECT md5(STRING_AGG(h, '' ORDER BY h)) FROM
        (SELECT md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h
         FROM s)) AS state_md5
    """,
)
def dl15_dv_purge_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta REORG APPLY (PURGE) oracle-checked (r15): documents as
    one doc_id-sorted file (v0), deletion-vector DELETE of doc_id%7
    (v1, merge-on-read), then ``reorg_delta_purge`` (v2) rewrites the
    indebted file without its dead rows and drops the descriptor —
    ``n_dv_after`` pins the debt at the oracle's literal 0,
    ``n_files_after`` pins the rewrite landed as one file, and the
    CDF digest pins that the purge commit is LAYOUT-ONLY
    (dataChange=false: the feed carries v0 inserts and v1 deletes,
    nothing for v2).  State digest matches DuckDB bit for bit, and
    time travel below the purge still subtracts the vector.

    At 100 TB: purge cost is O(DV-carrying files), never the table —
    the only way a writer-7 DV table's read-side anti-join debt
    clears (OPTIMIZE correctly refuses such tables).  Cf. reference
    `tulflow` (no lake-format surface); Delta PROTOCOL.md §Deletion
    Vectors."""
    import tempfile

    from tulflow_spark.ext.delta_log import (
        _replay,
        delete_rows_with_dv,
        read_delta,
        read_delta_cdf,
        reorg_delta_purge,
        write_delta,
    )

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .coalesce(1).sortWithinPartitions("doc_id"))
    t = tempfile.mkdtemp(prefix="dl15_") + "/tbl"
    write_delta(docs, t)                                       # v0
    snap = _replay(spark, t, None)
    (add_path,) = snap.live
    # GATE-SCALE ORACLE SCAFFOLDING ONLY (the dl5 precedent): this
    # collect builds the DV fixture's row-index INPUT — production
    # deletes arrive as positions
    ids = [r["doc_id"] for r in
           read_delta(spark, t).select("doc_id").collect()]
    delete_rows_with_dv(
        spark, t,
        {add_path: [i for i, doc in enumerate(sorted(ids))
                    if doc % 7 == 0]})                         # v1
    reorg_delta_purge(spark, t)                                # v2
    after = read_delta(spark, t)
    snap2 = _replay(spark, t, None)
    n_dv = sum(1 for a in snap2.live.values()
               if a.get("deletionVector"))
    feed = read_delta_cdf(spark, t, 0)
    key = F.concat_ws(
        "|", F.col("_change_type"), F.md5("text"),
        F.col("_commit_version").cast("string"))
    agg = feed.where("_change_type <> 'update_preimage'").agg(
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(key))))
         .alias("feed_md5"))
    srow = after.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                              F.col("text"))))))).alias("state_md5"),
    ).first()
    return (agg
            .withColumn("n_dv_after", F.lit(n_dv).cast("bigint"))
            .withColumn("n_files_after",
                        F.lit(len(after.inputFiles()))
                        .cast("bigint"))
            .withColumn("n_state",
                        F.lit(int(srow["n_state"])).cast("bigint"))
            .withColumn("state_md5", F.lit(srow["state_md5"]))
            .select("n_dv_after", "n_files_after", "feed_md5",
                    "n_state", "state_md5"))
