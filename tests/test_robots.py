"""ext/robots.py: robots.txt URL filtering on the stdlib parser."""

from __future__ import annotations

from tulflow_spark.ext.robots import parse_robots, robots_allowed


ROBOTS = {
    "a.example.com": "User-agent: *\nDisallow: /private/\n",
    "b.example.com": "User-agent: *\nDisallow: /\n",
    "c.example.com": "",  # empty body: everything allowed (RFC 9309)
    "d.example.com": (
        "User-agent: goodbot\nDisallow:\n\n"
        "User-agent: *\nDisallow: /\n"
    ),
}


def test_prefix_rules():
    assert robots_allowed("https://a.example.com/pub/x", ROBOTS) is True
    assert robots_allowed("https://a.example.com/private/x", ROBOTS) is False
    assert robots_allowed("https://b.example.com/", ROBOTS) is False
    assert robots_allowed("https://c.example.com/anything", ROBOTS) is True


def test_agent_sections():
    assert robots_allowed("https://d.example.com/x", ROBOTS,
                          agent="goodbot") is True
    assert robots_allowed("https://d.example.com/x", ROBOTS,
                          agent="badbot") is False


def test_default_allow_policy():
    u = "https://unknown.example.com/x"
    assert robots_allowed(u, ROBOTS) is True
    assert robots_allowed(u, ROBOTS, default_allow=False) is False


def test_unparseable_urls_are_none():
    assert robots_allowed("not a url", ROBOTS) is None
    assert robots_allowed("", ROBOTS) is None


def test_parser_cache_is_process_level_keyed_by_body():
    """Review r9: bodies parse once per EXECUTOR PROCESS (module-level
    cache, keyed by body text so two jobs with different bodies for one
    host never collide) — not once per task."""
    import tulflow_spark.ext.robots as R

    R._CACHE.clear()
    robots_allowed("https://a.example.com/x", ROBOTS)
    rp = R._CACHE[ROBOTS["a.example.com"]]
    robots_allowed("https://a.example.com/y", ROBOTS)
    assert R._CACHE[ROBOTS["a.example.com"]] is rp
    # a DIFFERENT body for the same host gets its own parser
    other = {"a.example.com": "User-agent: *\nDisallow:\n"}
    assert robots_allowed("https://a.example.com/x", other) is True
    assert robots_allowed("https://a.example.com/x", ROBOTS) is True
    assert robots_allowed("https://a.example.com/private/x",
                          ROBOTS) is False


def test_spark_udf(spark):
    from tulflow_spark.ext.robots import robots_allowed_udf

    rows = [
        (0, "https://a.example.com/private/p"),
        (1, "https://a.example.com/pub/p"),
        (2, None),
        (3, "https://unknown.example.com/p"),
    ]
    df = spark.createDataFrame(rows, "i int, url string")
    allowed = robots_allowed_udf(ROBOTS)
    out = {r["i"]: r["ok"] for r in
           df.select("i", allowed("url").alias("ok")).collect()}
    assert out == {0: False, 1: True, 2: None, 3: True}


def test_port_and_userinfo_stripped():
    """Review r9: lookup is by hostname — a ported or credentialed URL
    must still hit its domain's robots body."""
    assert robots_allowed("https://a.example.com:443/private/x",
                          ROBOTS) is False
    assert robots_allowed("https://user@a.example.com/private/x",
                          ROBOTS) is False
    assert robots_allowed("https://A.EXAMPLE.COM/private/x",
                          ROBOTS) is False  # hostname lowercases


def test_mixed_case_dict_keys_normalized():
    """ADVICE r9: a robots body keyed 'Example.com' must govern
    example.com URLs — hostname lookups are lowercase, so keys
    normalize once at entry (both the per-call API and the UDF)."""
    mixed = {"A.Example.COM": "User-agent: *\nDisallow: /private/\n"}
    assert robots_allowed("https://a.example.com/private/x",
                          mixed) is False
    assert robots_allowed("https://a.example.com/pub/x", mixed) is True
