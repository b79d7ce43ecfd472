"""robots.txt-aware URL filtering — the crawl-politeness gate a
web-scale acquisition pipeline runs before fetching (and re-runs over
already-crawled corpora when takedown/robots changes require honoring
retroactively).

The parser is the stdlib :class:`urllib.robotparser.RobotFileParser`
fed from TEXT (the robots bodies live in a table alongside the crawl,
keyed by registrable domain) — real agent-section resolution,
``Disallow``/``Allow`` rules and wildcard-agent fallback, not a regex
approximation.  Policy knobs:

- ``default_allow``: a URL whose domain has NO robots body is allowed
  (the crawl convention: absent robots.txt means no restrictions);
  pass ``False`` for a conservative pipeline that only keeps
  explicitly-permitted URLs.
- an EMPTY robots body allows everything (the RFC 9309 default).

Spark shape: the domain→body dict broadcasts via the UDF closure
(robots bodies are KBs per domain); each executor parses every body
ONCE into a cached parser table, then matching is two dict hops + the
stdlib rule walk per URL — map-side only, URLs never shuffle.

Reference analog: none (the reference harvests OAI-PMH, not the web);
north-star crawl surface beside ext/html.py and cur5's pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: TC003 (pandas_udf resolves)
from urllib.parse import urlsplit
from urllib.robotparser import RobotFileParser

import pandas as pd


def parse_robots(body: str) -> RobotFileParser:
    """One robots.txt TEXT → a stdlib parser (no network — the body
    came from the crawl itself)."""
    rp = RobotFileParser()
    rp.parse(body.splitlines())
    return rp


# process-level parser cache keyed by BODY text (not host: two jobs
# may carry different bodies for one host) — the ext/automaton.py
# bounded-cache pattern, so bodies parse once per executor, not per task
_CACHE: dict[str, RobotFileParser] = {}


def _cached_parser(body: str) -> RobotFileParser:
    rp = _CACHE.get(body)
    if rp is None:
        if len(_CACHE) > 4096:
            _CACHE.clear()  # bound executor memory across robots sets
        rp = _CACHE[body] = parse_robots(body)
    return rp


def _allowed_normalized(url: str, bodies: dict[str, str], agent: str,
                        default_allow: bool) -> bool | None:
    """Core decision; ``bodies`` keys MUST already be lowercase
    (``urlsplit().hostname`` lowercases, so a mixed-case key would
    silently fall through to ``default_allow``)."""
    try:
        host = urlsplit(url).hostname
    except ValueError:
        return None
    if not host:
        return None
    body = bodies.get(host)
    if body is None:
        return default_allow
    return _cached_parser(body).can_fetch(agent, url)


def robots_allowed(url: str, robots_by_domain: dict[str, str],
                   agent: str = "*", default_allow: bool = True) -> \
        bool | None:
    """Is ``url`` fetchable for ``agent`` under its domain's robots
    body?  ``None`` for unparseable URLs (no host) — typed enough to
    filter on, without killing a 100 TB pass over one junk row.
    Lookup is by HOSTNAME (port and userinfo stripped — a robots body
    keyed ``a.example.com`` must govern ``a.example.com:443`` too);
    keys are case-normalized here, so ``'Example.com'`` governs
    ``example.com`` URLs too.  Hot paths (the UDF below) normalize once
    instead of per call."""
    return _allowed_normalized(
        url, {k.lower(): v for k, v in robots_by_domain.items()},
        agent, default_allow,
    )


def robots_allowed_udf(robots_by_domain: dict[str, str],
                       agent: str = "*", default_allow: bool = True):
    """Arrow-batched UDF factory: ``col(url) -> boolean`` (NULL for
    NULL/unparseable URLs).  Bodies parse once per executor."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    # normalize ONCE: hostname lookups are lowercase (see
    # _allowed_normalized), and per-row re-normalization in the UDF
    # would rebuild the dict a billion times
    bodies = {k.lower(): v for k, v in robots_by_domain.items()}

    @pandas_udf(BooleanType())
    def _allowed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda u: _allowed_normalized(
                    u, bodies, agent, default_allow,
                ) if u is not None else None
            ).astype("boolean")

    return _allowed


__all__ = ["parse_robots", "robots_allowed", "robots_allowed_udf"]
