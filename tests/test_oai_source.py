"""OAI-PMH source tests against a real local HTTP server: pagination via
resumption tokens, set include/exclude resolution, retry on 503, deleted
handling, noRecordsMatch → empty — the reference's harvest matrix
(test_harvest.py scenarios) driven through the custom DataSource."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from tulflow_spark.sources import oai as O

OAI = "http://www.openarchives.org/OAI/2.0/"


def _rec(ident, deleted=False, with_md=True, sets=("alpha",),
         ds="2026-01-02T03:04:05Z"):
    status = ' status="deleted"' if deleted else ""
    setspecs = "".join(f"<setSpec>{s}</setSpec>" for s in sets)
    md = (
        f"<metadata><doc xmlns='urn:t'><t>{ident}</t></doc></metadata>"
        if with_md and not deleted
        else ""
    )
    return (
        f"<record><header{status}><identifier>{ident}</identifier>"
        f"<datestamp>{ds}</datestamp>{setspecs}</header>{md}</record>"
    )


# a set whose server honors from/until (second granularity): one record per
# day across four days — the surface the datestamp-sliced harvest exercises
WIN_RECORDS = [
    (f"oai:w:{d}", f"2026-01-0{d}T12:00:00Z") for d in (1, 2, 3, 4)
]


def _page(records, token=None):
    tok = f"<resumptionToken>{token}</resumptionToken>" if token else ""
    return (
        f'<?xml version="1.0"?><OAI-PMH xmlns="{OAI}">'
        f"<ListRecords>{''.join(records)}{tok}</ListRecords></OAI-PMH>"
    ).encode()


ERROR_NO_RECORDS = (
    f'<?xml version="1.0"?><OAI-PMH xmlns="{OAI}">'
    '<error code="noRecordsMatch">empty</error></OAI-PMH>'
).encode()

LIST_SETS = (
    f'<?xml version="1.0"?><OAI-PMH xmlns="{OAI}"><ListSets>'
    "<set><setSpec>alpha</setSpec></set>"
    "<set><setSpec>beta</setSpec></set>"
    "<set><setSpec>gamma</setSpec></set>"
    "</ListSets></OAI-PMH>"
).encode()

_flaky_hits = {"n": 0}


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        verb = q.get("verb", [""])[0]
        body = None
        if verb == "ListSets":
            body = LIST_SETS
        elif verb == "ListRecords":
            token = q.get("resumptionToken", [None])[0]
            set_spec = q.get("set", [None])[0]
            if token == "alpha-page2":
                body = _page([_rec("oai:a:3"), _rec("oai:a:4", deleted=True)])
            elif set_spec == "alpha":
                body = _page([_rec("oai:a:1"), _rec("oai:a:2")], token="alpha-page2")
            elif set_spec == "beta":
                body = ERROR_NO_RECORDS
            elif set_spec == "gamma":
                body = _page([_rec("oai:g:1", sets=("gamma",))])
            elif set_spec == "win":
                frm = q.get("from", [""])[0]
                untl = q.get("until", ["9999"])[0]
                hits = [
                    _rec(i, sets=("win",), ds=ds)
                    for i, ds in WIN_RECORDS
                    if frm <= ds <= untl
                ]
                body = _page(hits) if hits else ERROR_NO_RECORDS
            elif set_spec == "flaky":
                _flaky_hits["n"] += 1
                if _flaky_hits["n"] <= 2:
                    self.send_error(503)
                    return
                body = _page([_rec("oai:f:1", sets=("flaky",))])
            elif set_spec is None:
                body = _page([_rec("oai:all:1")])
        if body is None:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/xml")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def endpoint():
    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/oai"
    server.shutdown()


def test_list_records_pagination(endpoint):
    rows = list(O.list_records(endpoint, set_spec="alpha"))
    assert [r["identifier"] for r in rows] == [
        "oai:a:1", "oai:a:2", "oai:a:3", "oai:a:4",
    ]
    assert rows[3]["deleted"] and rows[3]["metadata_xml"] is None
    assert rows[0]["metadata_xml"] and "urn:t" in rows[0]["metadata_xml"]


def test_ignore_deleted(endpoint):
    rows = list(O.list_records(endpoint, set_spec="alpha", ignore_deleted=True))
    assert [r["identifier"] for r in rows] == ["oai:a:1", "oai:a:2", "oai:a:3"]


def test_no_records_match_is_empty(endpoint):
    assert list(O.list_records(endpoint, set_spec="beta")) == []


def test_retry_on_503(endpoint):
    _flaky_hits["n"] = 0
    rows = list(O.list_records(endpoint, set_spec="flaky"))
    assert [r["identifier"] for r in rows] == ["oai:f:1"]
    assert _flaky_hits["n"] == 3  # two 503s then success


def test_resolve_sets(endpoint):
    assert O.resolve_sets(endpoint, included=["x", "y"]) == ["x", "y"]
    assert O.resolve_sets(endpoint, excluded=["beta"]) == ["alpha", "gamma"]
    assert O.resolve_sets(endpoint, all_sets=True) == ["alpha", "beta", "gamma"]
    assert O.resolve_sets(endpoint) == [None]


def test_datestamp_slices_partition_exactly():
    s = O.datestamp_slices(
        "2026-01-01T00:00:00Z", "2026-01-04T23:59:59Z", 4
    )
    assert s == [
        ("2026-01-01T00:00:00Z", "2026-01-01T23:59:59Z"),
        ("2026-01-02T00:00:00Z", "2026-01-02T23:59:59Z"),
        ("2026-01-03T00:00:00Z", "2026-01-03T23:59:59Z"),
        ("2026-01-04T00:00:00Z", "2026-01-04T23:59:59Z"),
    ]
    # uneven split still covers exactly, no overlap, no gap
    s = O.datestamp_slices("2026-01-01T00:00:00Z", "2026-01-01T00:00:09Z", 3)
    assert s[0][0] == "2026-01-01T00:00:00Z"
    assert s[-1][1] == "2026-01-01T00:00:09Z"
    for (_, a_end), (b_start, _) in zip(s, s[1:]):
        assert a_end < b_start
    # n clamped to the window's seconds; date-only widened to midnight
    assert O.datestamp_slices("2026-01-01", "2026-01-01", 10) == [
        ("2026-01-01T00:00:00Z", "2026-01-01T00:00:00Z")
    ]
    with pytest.raises(ValueError):
        O.datestamp_slices("2026-01-02", "2026-01-01", 2)


def test_datasource_sliced_harvest(spark, endpoint):
    df = O.harvest_oai(
        spark,
        endpoint,
        includedSets="win",
        **{
            "from": "2026-01-01T00:00:00Z",
            "until": "2026-01-04T23:59:59Z",
            "slices": "4",
        },
    )
    # one partition per (set x slice); all records exactly once
    assert df.rdd.getNumPartitions() == 4
    ids = sorted(r.identifier for r in df.collect())
    assert ids == ["oai:w:1", "oai:w:2", "oai:w:3", "oai:w:4"]
    # per-partition counts prove the windows actually split the work
    sizes = df.rdd.glom().map(len).collect()
    assert sizes == [1, 1, 1, 1]


def test_sliced_harvest_requires_bounds(spark, endpoint):
    with pytest.raises(Exception):
        O.harvest_oai(spark, endpoint, includedSets="win", slices="4").collect()


def test_datasource_harvest(spark, endpoint):
    df = O.harvest_oai(
        spark, endpoint, includedSets="alpha,beta,gamma", ignoreDeleted="true"
    )
    rows = df.collect()
    ids = sorted(r.identifier for r in rows)
    assert ids == ["oai:a:1", "oai:a:2", "oai:a:3", "oai:g:1"]
    by_id = {r.identifier: r for r in rows}
    assert by_id["oai:g:1"].source_set == "gamma"
    assert by_id["oai:a:1"].datestamp.year == 2026
    # one input partition per set
    assert df.rdd.getNumPartitions() == 3
