"""Small control-plane helpers: rule fetching, debug log sink, templated
Solr URLs, conditional trigger predicate."""

from __future__ import annotations

import logging

import pytest

from tulflow_spark.admin.urls import get_solr_url_template, should_trigger
from tulflow_spark.sinks.report import log_sink
from tulflow_spark.sources.rules import (
    RuleFetchError,
    fetch_ruleset,
    raw_github_url,
)


def test_fetch_ruleset_file_url(tmp_path):
    p = tmp_path / "rules.sch"
    p.write_text("<schema/>")
    assert fetch_ruleset(p.as_uri()) == b"<schema/>"


def test_fetch_ruleset_error_is_typed_not_exit(tmp_path):
    with pytest.raises(RuleFetchError, match="cannot fetch"):
        fetch_ruleset((tmp_path / "missing.xsl").as_uri())


def test_raw_github_url():
    assert raw_github_url("org/repo", "rules/x.xsl", "dev") == (
        "https://raw.githubusercontent.com/org/repo/dev/rules/x.xsl"
    )


def test_log_sink(spark, caplog):
    df = spark.createDataFrame([(i,) for i in range(30)], "i int")
    with caplog.at_level(logging.INFO, logger="tulflow_spark"):
        total = log_sink(df, max_rows=5)
    assert total == 30
    assert "30 rows total (5 shown)" in caplog.text


def test_get_solr_url_template():
    assert get_solr_url_template("SOLRCLOUD", "catalog") == (
        "{{ conn.SOLRCLOUD.schema }}://{{ conn.SOLRCLOUD.host }}:"
        "{{ conn.SOLRCLOUD.port }}/solr/catalog"
    )


def test_should_trigger():
    assert should_trigger("do_index", {"do_index": True})
    assert not should_trigger("do_index", {"do_index": False})
    assert not should_trigger("do_index", {})
