"""Solr admin client + indexing sink tests against a local HTTP server that
plays a minimal SolrCloud Collections API (state held in-process) — the
reference's admin matrix: alias membership edits, refuse-to-empty guard,
idempotent delete, configset versioning, blue/green cycle, -init filtering."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from tulflow_spark.admin.solr_api import (
    SolrApiError,
    SolrCloudClient,
    filter_init_collection,
    most_recent_configsets,
)
from tulflow_spark.admin.urls import Connection, get_solr_url
from tulflow_spark.sinks.solr import index_to_solr

STATE = {
    "collections": ["catalog-blue", "catalog-green", "catalog-init"],
    "aliases": {"catalog": "catalog-blue,catalog-init"},
    "configsets": ["catalog-9", "catalog-10", "other-1", "plain"],
    "posted_docs": [],
    "commits": 0,
}


class FakeSolr(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _json(self, body: dict):
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        url = urllib.parse.urlparse(self.path)
        q = {k: v[0] for k, v in urllib.parse.parse_qs(url.query).items()}
        action = q.get("action")
        if url.path.endswith("/admin/collections"):
            if action == "LIST":
                self._json({"collections": list(STATE["collections"])})
            elif action == "LISTALIASES":
                self._json({"aliases": dict(STATE["aliases"])})
            elif action == "CREATE":
                name = q["name"]
                if q.get("collection.configName") == "missing-configset":
                    self._json({"error": {"msg": "Can not find the specified config set"}})
                    return
                STATE["collections"].append(name)
                self._json({"success": True})
            elif action == "DELETE":
                STATE["collections"].remove(q["name"])
                self._json({"success": True})
            elif action == "CREATEALIAS":
                STATE["aliases"][q["name"]] = q["collections"]
                self._json({"success": True})
            else:
                self._json({"error": {"msg": f"bad action {action}"}})
        elif url.path.endswith("/admin/configs"):
            self._json({"configSets": list(STATE["configsets"])})
        else:
            self.send_error(404)

    def do_POST(self):
        url = urllib.parse.urlparse(self.path)
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        if "/update/json/docs" in url.path:
            STATE["posted_docs"].extend(json.loads(body))
        elif "commit=true" in (url.query or ""):
            STATE["commits"] += 1
        self._json({"responseHeader": {"status": 0}})


@pytest.fixture(scope="module")
def solr_url():
    server = HTTPServer(("127.0.0.1", 0), FakeSolr)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}/solr"
    server.shutdown()


@pytest.fixture()
def client(solr_url):
    return SolrCloudClient(solr_url)


def test_collections_and_aliases(client):
    assert client.collection_exists("catalog-blue")
    assert not client.collection_exists("nope")
    assert client.get_alias_collections("catalog") == [
        "catalog-blue", "catalog-init",
    ]
    assert client.get_alias_collections_without_init("catalog") == ["catalog-blue"]
    assert client.is_collection_in_alias("catalog-blue", "catalog")


def test_refuse_to_empty_alias(client):
    STATE["aliases"]["solo"] = "only-one"
    with pytest.raises(ValueError):
        client.remove_collection_from_alias("only-one", "solo")


def test_error_unwrap(client):
    with pytest.raises(SolrApiError, match="config set"):
        client.create_collection("x", "missing-configset")


def test_idempotent_delete(client):
    before = client.get_collections()
    client.delete_collection("never-existed")  # no exception
    assert client.get_collections() == before


def test_blue_green_cycle(client):
    client.remove_and_recreate_collection_from_alias(
        "catalog-green", "catalog", configset="catalog-10"
    )
    assert client.is_collection_in_alias("catalog-green", "catalog")
    assert "catalog-green" in client.get_collections()


def test_most_recent_configsets():
    assert most_recent_configsets(
        ["catalog-9", "catalog-10", "other-1", "plain"]
    ) == ["catalog-10", "other-1", "plain"]


def test_filter_init_collection():
    assert filter_init_collection(["a", "a-init", "b"]) == ["a", "b"]


def test_get_solr_url():
    assert get_solr_url(Connection("example.org"), "core1") == (
        "http://example.org/solr/core1"
    )
    assert get_solr_url(
        Connection("example.org", schema="https", port=8983), "c"
    ) == "https://example.org:8983/solr/c"
    assert get_solr_url(Connection("https://already.example"), "c") == (
        "https://already.example/solr/c"
    )


def test_index_to_solr_sink(spark, solr_url):
    STATE["posted_docs"].clear()
    STATE["commits"] = 0
    df = spark.createDataFrame(
        [(i, f"title {i}") for i in range(20)], "id int, title string"
    ).repartition(3)
    index_to_solr(df, solr_url, "catalog-blue", batch_size=4)
    assert len(STATE["posted_docs"]) == 20
    assert {d["id"] for d in STATE["posted_docs"]} == set(range(20))
    assert STATE["commits"] == 1  # one driver-side commit, never per batch


def test_add_collection_drops_init(client):
    """Re-pointing an alias drops the '-init' bootstrap collection — the
    reference's deliberate blue/green semantics (solr_api_utils.py:227-235)."""
    STATE["aliases"]["cat2"] = "cat2-blue,cat2-init"
    client.add_collection_to_alias("cat2-green", "cat2")
    assert client.get_alias_collections("cat2") == ["cat2-blue", "cat2-green"]


def test_index_stream_to_solr(spark, solr_url, tmp_path):
    """The harvest→index tail as a stream: two file-source micro-batches
    each posted and committed; a document re-indexed in batch 2 overwrites
    by id (at-least-once + idempotent id = exactly-once visible state)."""
    from tulflow_spark.sinks.solr import index_stream_to_solr

    STATE["posted_docs"].clear()
    STATE["commits"] = 0
    src = tmp_path / "stream_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, "one"), (2, "two")], "id int, title string"
    ).coalesce(1).write.parquet(str(src / "b0"))
    for f in (src / "b0").iterdir():
        if f.suffix == ".parquet":
            f.rename(src / "000.parquet")

    stream = spark.readStream.schema("id int, title string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = index_stream_to_solr(
        stream, solr_url, "catalog-blue", str(tmp_path / "ckpt"), batch_size=1
    )
    try:
        q.processAllAvailable()
        assert {d["id"] for d in STATE["posted_docs"]} == {1, 2}
        first_commits = STATE["commits"]
        assert first_commits >= 1

        spark.createDataFrame(
            [(2, "two-revised"), (3, "three")], "id int, title string"
        ).coalesce(1).write.parquet(str(src / "b1"))
        for f in (src / "b1").iterdir():
            if f.suffix == ".parquet":
                f.rename(src / "001.parquet")
        q.processAllAvailable()
    finally:
        q.stop()
    assert {d["id"] for d in STATE["posted_docs"]} == {1, 2, 3}
    assert [d["title"] for d in STATE["posted_docs"] if d["id"] == 2] == [
        "two", "two-revised",
    ]
    assert STATE["commits"] > first_commits  # commit per micro-batch


def test_index_stream_restart_resumes_from_checkpoint(spark, solr_url, tmp_path):
    """Kill the streaming query, add data, restart with the SAME
    checkpoint: already-committed micro-batches must not be re-posted
    (Spark's batch-id tracking), only the new file flows."""
    from tulflow_spark.sinks.solr import index_stream_to_solr

    STATE["posted_docs"].clear()
    src = tmp_path / "restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "restart_ckpt")

    def add_file(name, rows):
        d = src / f"_{name}"
        spark.createDataFrame(rows, "id int, title string").coalesce(1)\
            .write.parquet(str(d))
        for f in d.iterdir():
            if f.suffix == ".parquet":
                f.rename(src / f"{name}.parquet")

    add_file("000", [(1, "one")])
    stream = lambda: spark.readStream.schema("id int, title string").parquet(str(src))  # noqa: E731
    q = index_stream_to_solr(stream(), solr_url, "catalog-blue", ckpt)
    q.processAllAvailable()
    q.stop()
    assert [d["id"] for d in STATE["posted_docs"]] == [1]

    add_file("001", [(2, "two")])
    q2 = index_stream_to_solr(stream(), solr_url, "catalog-blue", ckpt)
    q2.processAllAvailable()
    q2.stop()
    ids = [d["id"] for d in STATE["posted_docs"]]
    assert ids == [1, 2]  # batch 0 NOT re-posted after restart
