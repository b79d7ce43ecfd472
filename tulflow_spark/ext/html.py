"""HTML → text extraction: the WET-extraction stage of a crawl pipeline
(raw markup → visible text + title + outgoing links) as an Arrow-batched
``mapInPandas`` stage over stdlib ``html.parser`` — no external parser
dependency, markup bytes never leave the stage.

Semantics (golden-tested):

- script/style/noscript/template subtrees contribute NO text;
- entities decode (``&amp;`` → ``&``; HTMLParser with convert_charrefs);
- whitespace collapses to single spaces, block-level boundaries included
  (div/p/br/li/tr/h1-6 separate words that markup kept apart);
- ``<title>`` is captured separately and excluded from body text;
- links = every ``a[href]``, resolved against ``base_url`` when given
  (stdlib urljoin) — the edge list a link-graph / PageRank stage consumes.

Scale: pure per-row work — embarrassingly parallel, no shuffle; the output
feeds the text stack (tx*/dd*) which is where shuffles begin.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SKIP = {"script", "style", "noscript", "template"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "blockquote", "pre", "hr",
}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_chunks: list[str] = []
        self.links: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
            return
        if self._skip_depth:
            # Inside script/style/noscript/template: the subtree
            # contributes NOTHING — not text, not <title>, and not
            # a[href] edges (a <noscript> link would otherwise pollute
            # the link graph PageRank consumes; r5 ADVICE).
            return
        if tag == "title":
            self._in_title = True
        elif tag == "a":
            href = dict(attrs).get("href")
            if href:
                self.links.append(href)
        if tag in _BLOCK:
            self.chunks.append(" ")

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False
        if tag in _BLOCK:
            self.chunks.append(" ")

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_chunks.append(data)
        else:
            self.chunks.append(data)


def extract_html(html: str, base_url: str | None = None) -> dict:
    """One document: → {title, text, links} (pure function, unit-testable)."""
    p = _Extractor()
    p.feed(html or "")
    p.close()
    text = " ".join("".join(p.chunks).split())
    title = " ".join("".join(p.title_chunks).split())
    links = [urljoin(base_url, h) if base_url else h for h in p.links]
    return {"title": title, "text": text, "links": links}


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    base_url_col: str | None = None,
) -> DataFrame:
    """(id, html[, base_url]) → (id, title, text, links array<string>)."""
    out_schema = (
        f"{id_col} bigint, title string, text string, links array<string>"
    )
    cols = [id_col, html_col] + ([base_url_col] if base_url_col else [])
    # per-row stdlib parsing is the expensive stage: run it at cluster
    # width even when the input scan is a single split (widen is a no-op
    # otherwise), and ship only the columns the parser needs (§4.1)
    from tulflow_spark.io import widen

    df = widen(df.select(*cols))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                base = r[base_url_col] if base_url_col else None
                got = extract_html(r[html_col], base)
                rows.append(
                    {
                        id_col: r[id_col],
                        "title": got["title"],
                        "text": got["text"],
                        "links": got["links"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, schema=out_schema)
