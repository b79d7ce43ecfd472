"""Streaming OAI harvest: micro-batches over datestamp windows against a
live local endpoint whose corpus grows between batches."""

from __future__ import annotations

import threading
import time
import urllib.parse
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

OAI = "http://www.openarchives.org/OAI/2.0/"

# (identifier, iso datestamp) — grows during the test
CORPUS: list[tuple[str, str]] = [
    ("oai:s:1", "2026-01-01T00:00:00Z"),
    ("oai:s:2", "2026-01-02T00:00:00Z"),
]


def _rec(ident, ds):
    return (
        f"<record><header><identifier>{ident}</identifier>"
        f"<datestamp>{ds}</datestamp></header>"
        f"<metadata><d xmlns='urn:s'><v>{ident}</v></d></metadata></record>"
    )


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        q = {k: v[0] for k, v in urllib.parse.parse_qs(
            urllib.parse.urlparse(self.path).query).items()}
        if q.get("verb") != "ListRecords":
            self.send_error(404)
            return
        frm, until = q.get("from", ""), q.get("until", "9999")
        hits = [_rec(i, d) for i, d in CORPUS if frm <= d <= until]
        if hits:
            body = (f'<?xml version="1.0"?><OAI-PMH xmlns="{OAI}">'
                    f"<ListRecords>{''.join(hits)}</ListRecords></OAI-PMH>")
        else:
            body = (f'<?xml version="1.0"?><OAI-PMH xmlns="{OAI}">'
                    '<error code="noRecordsMatch">none</error></OAI-PMH>')
        self.send_response(200)
        self.end_headers()
        self.wfile.write(body.encode())


@pytest.fixture(scope="module")
def endpoint():
    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}/oai"
    server.shutdown()


def test_streaming_incremental_harvest(spark, endpoint, tmp_path):
    from tulflow_spark.sources.oai import register_oai_source

    register_oai_source(spark)
    stream = (
        spark.readStream.format("oai")
        .option("endpoint", endpoint)
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("oai_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.identifier for r in spark.table("oai_stream").collect()}
        assert first == {"oai:s:1", "oai:s:2"}

        # corpus grows AFTER the first batch → next batch must pick it up:
        # a window's `until` lags 1s behind the wall clock (the current
        # second is still open), so wait two full seconds for the appended
        # record's second to close and enter a window
        now = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        CORPUS.append(("oai:s:3", now))
        time.sleep(2.2)
        q.processAllAvailable()
        rows = spark.table("oai_stream").collect()
        ids = [r.identifier for r in rows]
        assert "oai:s:3" in ids
        # inclusive-boundary records must NOT be emitted twice across windows
        assert len(ids) == len(set(ids))
    finally:
        q.stop()


def test_stream_window_advances_past_inclusive_until():
    from tulflow_spark.sources.oai import OaiStreamReader

    r = OaiStreamReader({"endpoint": "http://unused"})
    # first window: the user's `from` stays inclusive
    assert (
        r._next_from({"until": "2026-01-01T00:00:00Z", "first": True})
        == "2026-01-01T00:00:00Z"
    )
    # subsequent windows: advance one granularity unit past the previous
    # (inclusive) until so boundary datestamps aren't harvested twice
    assert (
        r._next_from({"until": "2026-01-01T00:00:00Z"})
        == "2026-01-01T00:00:01Z"
    )
