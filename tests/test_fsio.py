"""fsio: the pyarrow-filesystem layer under the custom writers.  Local
paths and file:// URIs must behave identically — the same call sites run
against s3:///hdfs:// on a cluster (scheme resolution is pyarrow's)."""

from __future__ import annotations

import pytest

from tulflow_spark import fsio


def test_roundtrip_and_listing(tmp_path):
    base = str(tmp_path / "a" / "b")
    fsio.write_text(f"{base}/one.txt", "hello")
    fsio.write_text(f"{base}/two.txt", "world")
    assert fsio.exists(f"{base}/one.txt")
    assert fsio.is_dir(base)
    assert sorted(fsio.list_names(base)) == ["one.txt", "two.txt"]
    assert fsio.list_names(str(tmp_path / "missing")) == []


def test_file_uri_equivalence(tmp_path):
    fsio.write_text(f"file://{tmp_path}/via_uri.txt", "x")
    assert fsio.exists(str(tmp_path / "via_uri.txt"))
    assert fsio.delete(f"file://{tmp_path}/via_uri.txt")
    assert not fsio.exists(str(tmp_path / "via_uri.txt"))


def test_delete_semantics(tmp_path):
    d = str(tmp_path / "dir")
    fsio.write_text(f"{d}/f.txt", "x")
    with pytest.raises(IsADirectoryError):
        fsio.delete(d)
    assert fsio.delete(d, recursive=True)
    assert not fsio.exists(d)
    assert fsio.delete(d, recursive=True) is False  # already gone


def test_xml_sink_accepts_file_uri(spark, tmp_path):
    """The content-addressed writer must take URIs, not just local paths —
    the executor-side flush is the piece that breaks first on a cluster."""
    from tulflow_spark.sinks.xml_sink import write_string_content_addressed

    out = write_string_content_addressed("<x/>", f"file://{tmp_path}/stage")
    import hashlib

    key = hashlib.md5(b"<x/>").hexdigest()
    assert out.endswith(key)
    assert (tmp_path / "stage" / key).read_text() == "<x/>"


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution across partitioned writes: a later batch adds a
    column; mergeSchema reads the union (old rows NULL-filled) — the
    staging-prefix contract when a harvest adds fields mid-stream."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id bigint, title string"
    ).write.parquet(d + "/batch=1")
    spark.createDataFrame(
        [(2, "b", "extra")], "id bigint, title string, note string"
    ).write.parquet(d + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "title", "note", "batch"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].note is None and rows[2].note == "extra"
    # without mergeSchema the footer of one file wins — column may be absent
    plain = spark.read.parquet(d)
    assert set(plain.columns) <= {"id", "title", "note", "batch"}


def test_write_text_exclusive_atomic_publish(tmp_path):
    """CAS create publishes atomically via temp-file + link: the loser
    raises FileExistsError with the winner's content intact, and no
    half-written target or temp debris survives (a crash mid-write
    used to leave an empty commit point that wedged the log's forward
    scan forever)."""
    import os

    import pytest as _pytest

    from tulflow_spark import fsio

    p = str(tmp_path / "m" / "v2.metadata.json")
    fsio.write_text_exclusive(p, "winner")
    with _pytest.raises(FileExistsError):
        fsio.write_text_exclusive(p, "loser")
    assert open(p).read() == "winner"
    # no in-flight debris left behind by either attempt
    assert os.listdir(str(tmp_path / "m")) == ["v2.metadata.json"]
    # debris-named files never match metadata discovery suffixes
    assert not "v2.metadata.json.inflight-x".endswith(".metadata.json")


def test_read_parquet_multipath_evolved_falls_back(spark, tmp_path):
    """io.read_parquet passes an explicit footer schema only when EVERY
    path's footer agrees (r15 VERDICT: pinning paths[0]'s footer over a
    schema-evolved set would impose one vintage's schema where Spark's
    inference picks an arbitrary file).  Two evolved files must take
    the inference fallback and read exactly like spark.read.parquet."""
    from tulflow_spark.io import read_parquet

    p1 = str(tmp_path / "v1.parquet")
    p2 = str(tmp_path / "v2.parquet")
    spark.createDataFrame([(1, "a")], "id bigint, title string") \
        .coalesce(1).write.parquet(p1)
    spark.createDataFrame([(2, "b", "x")],
                          "id bigint, title string, note string") \
        .coalesce(1).write.parquet(p2)
    ours = read_parquet(spark, p1, p2)
    plain = spark.read.parquet(p1, p2)
    assert ours.schema == plain.schema
    assert sorted(map(tuple, ours.collect())) == \
        sorted(map(tuple, plain.collect()))
    # homogeneous multi-path still takes the explicit-schema shortcut
    # and returns identical rows
    p3 = str(tmp_path / "v1b.parquet")
    spark.createDataFrame([(3, "c")], "id bigint, title string") \
        .coalesce(1).write.parquet(p3)
    both = read_parquet(spark, p1, p3)
    assert sorted(r.id for r in both.collect()) == [1, 3]
