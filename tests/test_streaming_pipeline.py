"""End-to-end streaming story (r4 VERDICT #7): OAI incremental-harvest
stream → per-record XSLT (micro-engine) → globally atomic CDC manifest
snapshot, run as ONE pipeline against a live local endpoint whose corpus
changes between micro-batches (insert → update → delete)."""

from __future__ import annotations

import threading
import time
import urllib.parse
from datetime import datetime, timedelta, timezone
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

OAI = "http://www.openarchives.org/OAI/2.0/"

# identifier → (datestamp, payload-or-None-for-deleted); mutated mid-test
CORPUS: dict[str, tuple[str, str | None]] = {}


def _iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _rec(ident: str, ds: str, payload: str | None) -> str:
    if payload is None:
        return (
            f'<record><header status="deleted">'
            f"<identifier>{ident}</identifier>"
            f"<datestamp>{ds}</datestamp></header></record>"
        )
    return (
        f"<record><header><identifier>{ident}</identifier>"
        f"<datestamp>{ds}</datestamp></header>"
        f"<metadata><d xmlns='urn:s'><v>{payload}</v></d></metadata>"
        f"</record>"
    )


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        q = {
            k: v[0]
            for k, v in urllib.parse.parse_qs(
                urllib.parse.urlparse(self.path).query
            ).items()
        }
        if q.get("verb") != "ListRecords":
            self.send_error(404)
            return
        frm, until = q.get("from", ""), q.get("until", "9999")
        hits = [
            _rec(i, ds, payload)
            for i, (ds, payload) in sorted(CORPUS.items())
            if frm <= ds <= until
        ]
        if hits:
            body = (
                f'<?xml version="1.0"?><OAI-PMH xmlns="{OAI}">'
                f"<ListRecords>{''.join(hits)}</ListRecords></OAI-PMH>"
            )
        else:
            body = (
                f'<?xml version="1.0"?><OAI-PMH xmlns="{OAI}">'
                '<error code="noRecordsMatch">none</error></OAI-PMH>'
            )
        self.send_response(200)
        self.end_headers()
        self.wfile.write(body.encode())


@pytest.fixture()
def endpoint():
    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}/oai"
    server.shutdown()


# outside the compiled-to-columns subset (xsl:for-each-group), so the
# pipeline MUST route through the per-partition micro-engine — this test
# also proves the round-5 XSLT 2.0 surface works executor-side
SHEET = (
    '<xsl:stylesheet xmlns:xsl="http://www.w3.org/1999/XSL/Transform"'
    ' xmlns:s="urn:s" version="2.0">'
    '<xsl:output omit-xml-declaration="yes"/>'
    '<xsl:template match="/">'
    "<doc><title><xsl:value-of select=\"upper-case(//s:v)\"/></title></doc>"
    "</xsl:template></xsl:stylesheet>"
)


def test_streaming_harvest_transform_snapshot(spark, endpoint, tmp_path):
    from tulflow_spark.pipelines import streaming_harvest_pipeline
    from tulflow_spark.streaming.manifest_snapshot import ManifestSnapshot

    now = datetime.now(timezone.utc)
    CORPUS.clear()
    CORPUS["oai:p:1"] = (_iso(now - timedelta(minutes=5)), "alpha")
    CORPUS["oai:p:2"] = (_iso(now - timedelta(minutes=4)), "beta")

    snap_path = str(tmp_path / "snapshot")
    q = streaming_harvest_pipeline(
        spark,
        endpoint,
        snap_path,
        SHEET,
        checkpoint=str(tmp_path / "ckpt"),
        n_buckets=4,
    )
    snap = ManifestSnapshot(snap_path)
    try:
        # ---- micro-batch 1: two inserts, transformed by the micro-engine
        q.processAllAvailable()
        v1 = snap.latest_version()
        assert v1 is not None
        got = {
            r["identifier"]: r["metadata_xml"]
            for r in snap.read(spark).collect()
        }
        assert got == {
            "oai:p:1": '<doc xmlns:s="urn:s"><title>ALPHA</title></doc>',
            "oai:p:2": '<doc xmlns:s="urn:s"><title>BETA</title></doc>',
        }

        # ---- micro-batch 2: update one key, delete the other; wait for
        # the mutation's wall-clock second to close (the stream's until
        # lags 1s) so the next window surely covers it
        time.sleep(1.2)
        now2 = datetime.now(timezone.utc)
        CORPUS["oai:p:1"] = (_iso(now2), "alpha-v2")
        CORPUS["oai:p:2"] = (_iso(now2), None)  # deleted
        time.sleep(2.2)
        q.processAllAvailable()

        v2 = snap.latest_version()
        assert v2 is not None and v2 > v1, "each batch commits a new version"
        got2 = {
            r["identifier"]: r["metadata_xml"]
            for r in snap.read(spark).collect()
        }
        assert got2 == {
            "oai:p:1": '<doc xmlns:s="urn:s"><title>ALPHA-V2</title></doc>'
        }
    finally:
        q.stop()