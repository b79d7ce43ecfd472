"""Scalar / aggregate helper expressions.

Two concerns live here:

1. **Reference scalar surface** (SURVEY.md §2.8): md5 content keys, `||`-split,
   `\\n`-join, normalize-space, starts-with, identifier-or-full-record fallback
   — each as a Column expression, never a Python UDF.

2. **Oracle-exact aggregates**: floating-point SUM/AVG is order-dependent, so a
   Spark sum over 32 partitions and a DuckDB sum over one thread can differ in
   the last ulp and break value-hash comparison.  ``dsum``/``davg`` cast to
   DECIMAL first (exact, associative, order-insensitive) and cast the final
   result back to DOUBLE, which both engines then represent bit-identically.
   The same trick is mirrored in the oracle SQL strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Precision chosen to hold 100 TB-scale sums of price-like values exactly.
_DEC = "decimal(30,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive SUM for DOUBLE columns (exact decimal accumulate)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) / COUNT({expr})"


# --- reference scalar surface ------------------------------------------------


def md5_key(col: Column | str) -> Column:
    """Content-addressed key (reference: harvest.py:260 `hashlib.md5`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def normalize_space(col: Column | str) -> Column:
    """XPath ``normalize-space()``: trim + collapse internal whitespace
    (reference: sch-sample.sch:22, xsl-sample-simple.xsl:50-52)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def split_packed(col: Column | str, sep: str = r"\|\|") -> Column:
    """Split a ``||``-packed XML-fragment list (reference: harvest.py:241)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def join_multivalue(col: Column | str, sep: str = "\n") -> Column:
    """``\\n``-join of a multi-valued field (reference: validate.py:215)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(c, sep)


def identifier_or_full_record(ids: Column, full_record: Column) -> Column:
    """Projection-with-fallback (reference: validate.py:202-216): newline-join
    of identifier hits when any exist, else the full serialized record."""
    return F.when(F.size(ids) > 0, F.array_join(ids, "\n")).otherwise(full_record)


def starts_with_http(col: Column | str) -> Column:
    """Schematron ``starts-with(., 'http')`` (reference: sch-sample.sch:41)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.startswith("http")


def canonicalize_url(col: Column | str) -> Column:
    """Crawl-style URL canonicalization, entirely in JVM column algebra (no
    UDF): lowercase scheme+host, strip default ports (:80 http / :443
    https), drop tracking query params (``utm_*``, ``fbclid``, ``gclid``),
    sort surviving params, drop the fragment, strip a trailing slash on the
    path.  The dedup key for URL-level dedup of a 100 TB crawl — applied
    map-side, so only (canonical_url, id) pairs ever shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(c, r"^[^:]+://([^/?#]*)", 1))
    host = (
        F.when(
            (scheme == "https") & hostport.endswith(":443"),
            hostport.substr(F.lit(1), F.length(hostport) - 4),
        )
        .when(
            (scheme == "http") & hostport.endswith(":80"),
            hostport.substr(F.lit(1), F.length(hostport) - 3),
        )
        .otherwise(hostport)
    )
    path = F.regexp_extract(c, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("fbclid=")
        & ~p.startswith("gclid="),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB mirror of :func:`canonicalize_url` (same canonical form)."""
    nofrag = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = f"lower(regexp_extract({nofrag}, '^[^:]+://([^/?#]*)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
        f"THEN substr({hostport}, 1, length({hostport}) - 4) "
        f"WHEN {scheme} = 'http' AND {hostport} LIKE '%:80' "
        f"THEN substr({hostport}, 1, length({hostport}) - 3) "
        f"ELSE {hostport} END"
    )
    rawpath = f"regexp_extract({nofrag}, '^[^:]+://[^/?#]*([^?#]*)', 1)"
    path = (
        f"CASE WHEN length({rawpath}) > 1 AND {rawpath} LIKE '%/' "
        f"THEN substr({rawpath}, 1, length({rawpath}) - 1) ELSE {rawpath} END"
    )
    query = f"regexp_extract({nofrag}, '\\?([^#]*)', 1)"
    params = (
        f"list_filter(string_split({query}, '&'), p -> p <> '' "
        f"AND p NOT LIKE 'utm\\_%' ESCAPE '\\' "
        f"AND p NOT LIKE 'fbclid=%' AND p NOT LIKE 'gclid=%')"
    )
    sq = f"array_to_string(list_sort({params}), '&')"
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {sq} <> '' THEN '?' || {sq} ELSE '' END"
    )
