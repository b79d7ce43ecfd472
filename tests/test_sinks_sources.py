"""Sink/source roundtrips: chunked content-addressed collection XML, tarball
member-count matrix, lookup CSV, CSV report."""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from datetime import datetime, timezone

import pytest

from tulflow_spark.model.xml_parse import read_oai_collections
from tulflow_spark.sinks.report import write_invalid_report
from tulflow_spark.sinks.xml_sink import (
    write_oai_collections,
    write_string_content_addressed,
)
from tulflow_spark.sources.lookup import read_boundwith_lookup
from tulflow_spark.sources.tarball import expand_tarball, read_alma_tarballs


def _envelope_rows(n, deleted_every=None):
    return [
        (
            f"oai:test:{i}",
            datetime(2026, 1, 1, tzinfo=timezone.utc),
            ["s1"],
            bool(deleted_every and i % deleted_every == 0),
            f'<rec xmlns="urn:x"><v>{i}</v></rec>',
        )
        for i in range(n)
    ]


ENVELOPE_DDL = (
    "identifier string, datestamp timestamp, set_specs array<string>, "
    "deleted boolean, metadata_xml string"
)


def test_collection_roundtrip_and_chunking(spark, tmp_path):
    df = spark.createDataFrame(_envelope_rows(25), ENVELOPE_DDL).repartition(2)
    out = str(tmp_path / "staged")
    write_oai_collections(
        df, out, records_per_file=10, dag_id="dag1", timestamp="ts1"
    )
    files = os.listdir(out)
    # 2 partitions × ceil-chunks of ≤10 → between 3 and 4 files, all ≤10 records
    assert 3 <= len(files) <= 4
    back = read_oai_collections(spark, out)
    assert back.count() == 25
    ids = {r.identifier for r in back.collect()}
    assert ids == {f"oai:test:{i}" for i in range(25)}
    # content-addressed names: md5 of the file bytes
    for f in files:
        with open(os.path.join(out, f), encoding="utf-8") as fh:
            assert hashlib.md5(fh.read().encode()).hexdigest() == f


def test_write_string_content_addressed(tmp_path):
    p = write_string_content_addressed("hello", str(tmp_path / "o"))
    assert os.path.basename(p) == hashlib.md5(b"hello").hexdigest()
    with open(p) as fh:
        assert fh.read() == "hello"


def _tgz(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_expand_tarball_matrix():
    one = expand_tarball(_tgz({"a.xml": b"<x/>"}))
    assert one == ("a.xml", b"<x/>", None)
    _, _, err0 = expand_tarball(_tgz({}))
    assert "found 0" in err0
    _, _, err2 = expand_tarball(_tgz({"a": b"1", "b": b"2"}))
    assert "found 2" in err2
    _, _, errbad = expand_tarball(b"not a tarball")
    assert "bad archive" in errbad


def test_read_alma_tarballs(spark, tmp_path):
    d = tmp_path / "tar"
    d.mkdir()
    (d / "good.tar.gz").write_bytes(_tgz({"inner.xml": b"<x>1</x>"}))
    (d / "bad.tar.gz").write_bytes(_tgz({"a": b"1", "b": b"2"}))
    rows = {os.path.basename(r.path): r for r in read_alma_tarballs(spark, str(d)).collect()}
    assert rows["good.tar.gz"].xml == "<x>1</x>"
    assert rows["good.tar.gz"].error is None
    assert rows["bad.tar.gz"].xml is None
    assert "found 2" in rows["bad.tar.gz"].error


def test_read_boundwith_lookup(spark, tmp_path):
    p = tmp_path / "lookup.csv"
    p.write_text("child_id,parent_id,parent_xml\n1,10,<a/>||<b/>\n2,20,<c/>\n")
    df = read_boundwith_lookup(spark, str(p))
    assert df.schema.simpleString() == (
        "struct<child_id:bigint,parent_id:bigint,parent_xml:string>"
    )
    assert df.count() == 2


def test_write_invalid_report(spark, tmp_path):
    df = spark.createDataFrame(
        [("r1", "bad", "<rec/>", "f.xml")],
        "id string, report string, record string, source_file string",
    )
    out = str(tmp_path / "report")
    write_invalid_report(df, out)
    csvs = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(csvs) == 1
    content = open(os.path.join(out, csvs[0])).read()
    assert content.splitlines()[0] == "id,report,record,source_file"
    assert "r1,bad,<rec/>,f.xml" in content


def test_missing_staging_dir_yields_empty_frame(spark, tmp_path):
    """Empty harvest → no staging dir → downstream stages see 0 records,
    not PATH_NOT_FOUND (reference: empty prefixes yield zero counts)."""
    df = read_oai_collections(spark, str(tmp_path / "never-written"))
    assert df.count() == 0
    assert "identifier" in df.columns


def test_golden_content_addressed_name(spark, tmp_path):
    """Byte-golden pin: a fixed input row must always serialize to the same
    bytes, i.e. the same md5 filename.  If serialization changes shape,
    this constant changes — update it CONSCIOUSLY (idempotent-retry naming
    depends on byte stability)."""
    df = spark.createDataFrame(
        [(
            "oai:golden:1",
            datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc),
            ["s1", "s2"],
            False,
            '<rec xmlns="urn:g"><v>7</v></rec>',
        )],
        ENVELOPE_DDL,
    ).coalesce(1)
    out = str(tmp_path / "golden")
    write_oai_collections(df, out, dag_id="g", timestamp="ts")
    names = os.listdir(out)
    # r2: constant updated consciously — the record-id attribute was renamed
    # to 'airflow-record-id' to match the reference staging format (ADVICE r1)
    assert names == ["5fd72bbbef4e483de54950e9ea8992a6"], names
