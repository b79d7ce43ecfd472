"""CLI surface: the full harvest→transform→validate chain driven through
``python -m tulflow_spark`` subcommands against a live OAI endpoint."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from tulflow_spark.cli import main

OAI = "http://www.openarchives.org/OAI/2.0/"

RECORDS = "".join(
    f"<record><header><identifier>oai:cli:{i}</identifier>"
    f"<datestamp>2026-02-01T00:00:00Z</datestamp></header>"
    f"<metadata><oai_dc:dc xmlns:oai_dc='http://www.openarchives.org/OAI/2.0/oai_dc/'"
    f" xmlns:dc='http://purl.org/dc/elements/1.1/'>"
    f"<dc:title>Title {i}</dc:title></oai_dc:dc></metadata></record>"
    for i in range(5)
)

XSL = """<?xml version="1.0"?>
<xsl:stylesheet xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
  xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:dcterms="http://purl.org/dc/terms/" version="2.0">
<xsl:template match="text() | @*"/>
<xsl:template match="dc:title">
  <xsl:if test="normalize-space(.)!=''">
    <xsl:element name="dcterms:title"><xsl:value-of select="normalize-space(.)"/></xsl:element>
  </xsl:if>
</xsl:template>
</xsl:stylesheet>
"""

SCH = """<?xml version="1.0"?>
<schema xmlns="http://purl.oclc.org/dsdl/schematron">
  <pattern id="p"><rule context="oai_dc:dc">
    <assert test="dcterms:title" id="R1">There must be a title</assert>
  </rule></pattern>
</schema>
"""


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        if q.get("verb", [""])[0] == "ListRecords":
            body = (f'<?xml version="1.0"?><OAI-PMH xmlns="{OAI}">'
                    f"<ListRecords>{RECORDS}</ListRecords></OAI-PMH>").encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)


@pytest.fixture(scope="module")
def endpoint():
    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}/oai"
    server.shutdown()


def test_cli_chain(spark, endpoint, tmp_path, capsys):
    base = str(tmp_path / "stage")
    xsl = tmp_path / "t.xsl"
    xsl.write_text(XSL)
    sch = tmp_path / "v.sch"
    sch.write_text(SCH)

    assert main([
        "harvest", "--endpoint", endpoint, "--out", base,
        "--dag-id", "cli", "--timestamp", "t1", "--stage-format", "parquet",
    ]) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1 == {"updated": 5, "deleted": 0}

    src = f"{base}/cli/t1/new-updated"
    assert main([
        "transform", "--src", src, "--dest", f"{base}/tx",
        "--stylesheet", str(xsl), "--stage-format", "parquet",
    ]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == {"transformed": 5}

    assert main([
        "validate", "--src", f"{base}/tx", "--dest", f"{base}/ok",
        "--report", f"{base}/report", "--schematron", str(sch),
        "--stage-format", "parquet",
    ]) == 0
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3 == {"total": 5, "valid": 5, "filtered": 0}
