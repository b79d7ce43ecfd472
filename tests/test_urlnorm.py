"""URL canonicalization: the Spark column expression and its DuckDB SQL
mirror must agree on a randomized corpus covering every rule — the two
implementations are hand-mirrored logic, which is exactly where drift
hides."""

from __future__ import annotations

import random

from tulflow_spark.functions import canonicalize_url, canonicalize_url_sql


def _random_urls(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    schemes = ["http", "https", "HTTP", "HTTPS", "Https"]
    hosts = ["Example.COM", "sub.site.org", "X.io", "a-b.net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a/b/", "/Docs/X", "/p/"]
    params = ["a=1", "b=2", "z=9&y=8", "utm_source=x", "utm_medium=r",
              "fbclid=f1", "gclid=g1", "m=3&utm_campaign=c", ""]
    frags = ["", "#top", "#a/b?c=1"]
    out = []
    for _ in range(n):
        q = rng.choice(params)
        out.append(
            rng.choice(schemes) + "://" + rng.choice(hosts)
            + rng.choice(ports) + rng.choice(paths)
            + (("?" + q) if q else "")
            + rng.choice(frags)
        )
    return out


def test_spark_and_duckdb_mirrors_agree(spark, duck):
    urls = _random_urls(300, seed=20260814)
    sdf = (
        spark.createDataFrame([(u,) for u in urls], "url string")
        .select("url", canonicalize_url("url").alias("c"))
        .toPandas()
        .sort_values("url")
    )
    duck.execute("CREATE OR REPLACE TABLE _urls(url VARCHAR)")
    duck.executemany("INSERT INTO _urls VALUES (?)", [(u,) for u in urls])
    odf = duck.sql(
        f"SELECT url, {canonicalize_url_sql('url')} AS c FROM _urls ORDER BY url"
    ).df()
    diffs = [
        (u, a, b)
        for u, a, b in zip(odf.url, sdf.c.values, odf.c.values)
        if a != b
    ]
    duck.execute("DROP TABLE _urls")
    assert not diffs, f"{len(diffs)} disagreements; first: {diffs[0]}"


def test_canonical_rules_golden(spark):
    cases = {
        "HTTPS://WWW.Ex.COM:443/A/?b=2&utm_source=x&a=1#f": "https://www.ex.com/A?a=1&b=2",
        "http://h.io:80/": "http://h.io/",
        "http://h.io:8080/x/?gclid=1&m=3": "http://h.io:8080/x?m=3",
        "https://q.net/?utm_campaign=c": "https://q.net/",
        "https://plain.net/path#frag": "https://plain.net/path",
    }
    sdf = (
        spark.createDataFrame([(u,) for u in cases], "url string")
        .select("url", canonicalize_url("url").alias("c"))
        .collect()
    )
    got = {r.url: r.c for r in sdf}
    assert got == cases
