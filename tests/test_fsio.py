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
