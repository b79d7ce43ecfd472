"""OAI-PMH harvest source (reference: harvest.py:24-150 — SURVEY §2.1 S1-S4)
as a PySpark custom DataSource.

Design, mapped from the reference:

- **partitioning**: one input partition per OAI set (``generate_oai_sets``
  include/exclude/all logic, harvest.py:68-92; the excluded-sets path calls
  ``ListSets`` and takes the set difference).  Each partition pages
  independently through its resumption tokens, so a 100-set harvest runs
  100-wide with zero coordination.
- **pagination**: ``resumptionToken`` loop (harvest.py:109-112) inside the
  partition reader — streaming, one page in memory at a time.
- **retry**: HTTP 500/503/504 retried up to 3 times (harvest.py:132), with
  backoff; other errors fail the task (Spark's task retry is the outer loop).
- **pushdown**: ``from``/``until``/``metadataPrefix`` become query params —
  the predicate is evaluated by the server, the scan-level analog of
  predicate pushdown (harvest.py:26-30).
- **scan-time filters**: ``ignore_deleted`` skips deleted records at the
  iterator (harvest.py:100-108); records with no metadata yield NULL
  ``metadata_xml`` and are filterable downstream.

Rows match ``model.schemas.OAI_RECORD_SCHEMA`` plus ``source_set``.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from collections.abc import Iterator

from tulflow_spark.model.xml_parse import OAI_NS, parse_oai_record, strip_ns

RETRY_STATUS = (500, 503, 504)
MAX_RETRIES = 3
TIMEOUT_S = 30


def _fetch(url: str, retries: int = MAX_RETRIES, backoff_s: float = 0.2) -> bytes:
    """GET with the reference's retry policy (500/503/504 × 3)."""
    attempt = 0
    while True:
        try:
            with urllib.request.urlopen(url, timeout=TIMEOUT_S) as resp:
                return resp.read()
        except urllib.error.HTTPError as exc:
            if exc.code in RETRY_STATUS and attempt < retries:
                attempt += 1
                time.sleep(backoff_s * attempt)
                continue
            raise


def oai_url(endpoint: str, **params: str) -> str:
    query = urllib.parse.urlencode(
        {k: v for k, v in params.items() if v not in (None, "")}
    )
    sep = "&" if "?" in endpoint else "?"
    return f"{endpoint}{sep}{query}"


class OaiProtocolError(RuntimeError):
    pass


def _check_errors(root: ET.Element) -> bool:
    """True when the page is empty-but-ok (noRecordsMatch → empty harvest,
    harvest.py:141-146); raises on real protocol errors."""
    for err in root.iter(f"{{{OAI_NS}}}error"):
        code = err.get("code", "")
        if code == "noRecordsMatch":
            return True
        raise OaiProtocolError(f"{code}: {err.text}")
    return False


def list_records(
    endpoint: str,
    metadata_prefix: str = "oai_dc",
    set_spec: str | None = None,
    from_date: str | None = None,
    until_date: str | None = None,
    ignore_deleted: bool = False,
) -> Iterator[dict]:
    """Stream all records of one set: ListRecords + resumptionToken loop."""
    url = oai_url(
        endpoint,
        verb="ListRecords",
        metadataPrefix=metadata_prefix,
        set=set_spec,
        **{"from": from_date, "until": until_date},
    )
    while True:
        root = ET.fromstring(_fetch(url))
        if _check_errors(root):
            return
        for rec in root.iter(f"{{{OAI_NS}}}record"):
            row = parse_oai_record(rec)
            if ignore_deleted and row["deleted"]:
                continue
            row["source_set"] = set_spec
            yield row
        token = next(root.iter(f"{{{OAI_NS}}}resumptionToken"), None)
        if token is None or not (token.text or "").strip():
            return
        url = oai_url(endpoint, verb="ListRecords", resumptionToken=token.text.strip())


def list_sets(endpoint: str) -> list[str]:
    """ListSets enumeration (harvest.py:87-89)."""
    root = ET.fromstring(_fetch(oai_url(endpoint, verb="ListSets")))
    if _check_errors(root):
        return []
    out = []
    for s in root.iter(f"{{{OAI_NS}}}set"):
        spec = next(
            (c.text for c in s if strip_ns(c.tag) == "setSpec" and c.text), None
        )
        if spec:
            out.append(spec)
    return out


def resolve_sets(
    endpoint: str,
    included: list[str] | None = None,
    excluded: list[str] | None = None,
    all_sets: bool = False,
) -> list[str | None]:
    """``generate_oai_sets`` include/exclude/all resolution
    (harvest.py:68-92).  ``[None]`` = harvest without a set filter."""
    if included:
        return list(included)
    if excluded:
        return [s for s in list_sets(endpoint) if s not in set(excluded)]
    if all_sets:
        return list_sets(endpoint)
    return [None]


# ---------------------------------------------------------------------------
# PySpark DataSource binding
# ---------------------------------------------------------------------------

OAI_SOURCE_SCHEMA = (
    "identifier string, datestamp timestamp, set_specs array<string>, "
    "deleted boolean, metadata_xml string, source_set string"
)


def _split_csv(s: str | None) -> list[str]:
    return [x.strip() for x in (s or "").split(",") if x.strip()]


_DS_FMT = "%Y-%m-%dT%H:%M:%SZ"


def _parse_datestamp(s: str):
    from datetime import datetime

    if len(s) == 10:  # date-only granularity
        return datetime.strptime(s, "%Y-%m-%d")
    return datetime.strptime(s, _DS_FMT)


def datestamp_slices(
    from_date: str, until_date: str, n: int
) -> list[tuple[str, str]]:
    """Partition the INCLUSIVE second-granularity window
    ``[from_date, until_date]`` into at most ``n`` disjoint inclusive
    sub-windows that cover it exactly.

    This is the batch face of the streaming reader's window mechanism
    (and the answer to single-set harvests at scale): OAI-PMH resumption
    tokens are inherently sequential WITHIN a request, but the protocol's
    own ``from``/``until`` predicates let N executors page N disjoint
    datestamp windows concurrently.  Windows never overlap — both bounds
    are inclusive per the spec, so consecutive windows abut at a
    one-second step, the same arithmetic the streaming offsets use
    (sources/oai.py OaiStreamReader; reference surface: the from/until
    kwargs of harvest.py:24-65).

    Requires a repository supporting second granularity (date-only inputs
    are widened to midnight).  ``n`` is clamped to the window's seconds.
    """
    from datetime import timedelta

    start, end = _parse_datestamp(from_date), _parse_datestamp(until_date)
    if end < start:
        raise ValueError(f"until {until_date!r} precedes from {from_date!r}")
    total = int((end - start).total_seconds()) + 1  # inclusive seconds
    n = max(1, min(int(n), total))
    step, rem = divmod(total, n)
    out: list[tuple[str, str]] = []
    cur = start
    for i in range(n):
        width = step + (1 if i < rem else 0)
        wend = cur + timedelta(seconds=width - 1)
        out.append((cur.strftime(_DS_FMT), wend.strftime(_DS_FMT)))
        cur = wend + timedelta(seconds=1)
    return out


try:  # DataSource API requires pyspark >= 4 (present here; guarded anyway)
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class OaiInputPartition(InputPartition):
        def __init__(
            self,
            set_spec: str | None,
            from_date: str | None = None,
            until_date: str | None = None,
        ):
            self.set_spec = set_spec
            self.from_date = from_date
            self.until_date = until_date

    class OaiDataSourceReader(DataSourceReader):
        def __init__(self, options: dict):
            self.endpoint = options["endpoint"]
            self.metadata_prefix = options.get("metadataprefix", "oai_dc")
            self.from_date = options.get("from")
            self.until_date = options.get("until")
            self.ignore_deleted = (
                str(options.get("ignoredeleted", "false")).lower() == "true"
            )
            self.included = _split_csv(options.get("includedsets"))
            self.excluded = _split_csv(options.get("excludedsets"))
            self.all_sets = str(options.get("allsets", "false")).lower() == "true"
            self.slices = int(options.get("slices", "1"))
            if self.slices > 1 and not (self.from_date and self.until_date):
                raise ValueError(
                    "slices > 1 requires both 'from' and 'until': datestamp "
                    "slicing parallelizes a BOUNDED window (resumption "
                    "tokens are sequential; windows are not)"
                )

        def partitions(self):
            sets = resolve_sets(
                self.endpoint, self.included, self.excluded, self.all_sets
            )
            if self.slices <= 1:
                return [OaiInputPartition(s) for s in sets]
            windows = datestamp_slices(
                self.from_date, self.until_date, self.slices
            )
            return [
                OaiInputPartition(s, frm, untl)
                for s in sets
                for (frm, untl) in windows
            ]

        def read(self, partition: OaiInputPartition):
            for row in list_records(
                self.endpoint,
                metadata_prefix=self.metadata_prefix,
                set_spec=partition.set_spec,
                from_date=partition.from_date or self.from_date,
                until_date=partition.until_date or self.until_date,
                ignore_deleted=self.ignore_deleted,
            ):
                yield (
                    row["identifier"],
                    row["datestamp"],
                    row["set_specs"],
                    row["deleted"],
                    row["metadata_xml"],
                    row["source_set"],
                )

    class OaiStreamReader(SimpleDataSourceStreamReader):
        """Incremental harvest as a stream: each micro-batch covers the
        datestamp window ``(last_until, now]`` using the protocol's own
        from/until predicates — the streaming face of the reference's
        scheduled re-harvest DAGs (SURVEY §2.7: from/until ≙ event-time
        range; deleted records arrive as CDC flags).

        Offsets are ISO-second datestamps, so restarts resume exactly where
        the checkpoint stopped and ``readBetweenOffsets`` replays any window
        deterministically (OAI harvests are repeatable by contract).

        OAI-PMH ``from``/``until`` are BOTH inclusive, so consecutive windows
        sharing a boundary would emit boundary-datestamped records twice; the
        next window's ``from`` therefore advances one granularity unit
        (second) past the previous ``until``.  The very first window keeps the
        user's ``from`` inclusive (marked by ``first`` in the offset).

        Symmetrically, ``until`` lags one second behind the wall clock: the
        current second is still open — a record committed "now" with a
        datestamp of the current second would otherwise land just behind an
        already-consumed window boundary and be skipped forever.
        """

        def __init__(self, options: dict):
            self.endpoint = options["endpoint"]
            self.metadata_prefix = options.get("metadataprefix", "oai_dc")
            self.included = _split_csv(options.get("includedsets")) or [None]
            self.ignore_deleted = (
                str(options.get("ignoredeleted", "false")).lower() == "true"
            )
            self.start_from = options.get("from", "1970-01-01T00:00:00Z")

        def initialOffset(self) -> dict:
            return {"until": self.start_from, "first": True}

        @staticmethod
        def _next_from(offset: dict) -> str:
            """Inclusive window start for the window AFTER ``offset``."""
            import datetime as _dt

            if offset.get("first"):
                return offset["until"]
            t = _dt.datetime.strptime(offset["until"], "%Y-%m-%dT%H:%M:%SZ")
            return (t + _dt.timedelta(seconds=1)).strftime("%Y-%m-%dT%H:%M:%SZ")

        def _harvest_window(self, frm: str, until: str) -> list:
            # materialized (not a generator): the streaming runner copies the
            # iterator for its prefetch cache, and generators can't be copied
            return list(self._iter_window(frm, until))

        def _iter_window(self, frm: str, until: str):
            for set_spec in self.included:
                for row in list_records(
                    self.endpoint,
                    metadata_prefix=self.metadata_prefix,
                    set_spec=set_spec,
                    from_date=frm,
                    until_date=until,
                    ignore_deleted=self.ignore_deleted,
                ):
                    yield (
                        row["identifier"],
                        row["datestamp"],
                        row["set_specs"],
                        row["deleted"],
                        row["metadata_xml"],
                        row["source_set"],
                    )

        def read(self, start: dict):
            import datetime as _dt

            # harvest only up to the last CLOSED second (see class docstring)
            until = (
                _dt.datetime.now(_dt.timezone.utc) - _dt.timedelta(seconds=1)
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
            if until <= start["until"]:
                return iter(()), start
            rows = self._harvest_window(self._next_from(start), until)
            return iter(rows), {"until": until}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(self._harvest_window(self._next_from(start), end["until"]))

    class OaiDataSource(DataSource):
        """``spark.read.format("oai")`` (batch) and
        ``spark.readStream.format("oai")`` (incremental harvest)."""

        @classmethod
        def name(cls) -> str:
            return "oai"

        def schema(self) -> str:
            return OAI_SOURCE_SCHEMA

        def reader(self, schema):
            return OaiDataSourceReader(self.options)

        def simpleStreamReader(self, schema):
            return OaiStreamReader(self.options)

except ImportError:  # pragma: no cover
    OaiDataSource = None  # type: ignore[assignment]


def register_oai_source(spark) -> None:
    if OaiDataSource is None:  # pragma: no cover
        raise NotImplementedError("PySpark DataSource API not available")
    spark.dataSource.register(OaiDataSource)


def harvest_oai(spark, endpoint: str, **options):
    """Convenience wrapper ≙ ``harvest.oai_to_s3``'s read half."""
    register_oai_source(spark)
    reader = spark.read.format("oai").option("endpoint", endpoint)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
