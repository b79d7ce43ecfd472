"""Structured Streaming SOURCE over the Delta change feed — a real
``spark.readStream.format(...)`` source built on Spark 4's Python Data
Source API, turning `ext/delta_log.py`'s incremental-read semantics
into a continuously polling stream.

Reference parity: the reference's harvest loop (tulflow
``harvest.py:126-150``) polls a paged upstream and lands new records
per run; this is the same incremental-consumption role with the Delta
log as the upstream and exactly-once offsets handled by Spark's own
streaming engine (offset log + commit log), not hand-rolled state.

Semantics (micro-batch):

- offsets are ``{"version": N}`` — a batch covers the dataChange adds
  of commits ``(start, end]``, exactly `read_delta_changes`' contract;
- a ``dataChange=true`` remove in range fails the BATCH typed
  (delete/overwrite cannot be expressed as appended rows — re-sync
  from a snapshot read), the same wall as the batch API;
- layout-only commits (OPTIMIZE) are correctly invisible;
- partitioned tables inject the log's partitionValues driver-side
  (typed parse, then shipped as Python constants inside each
  partition task);
- column-mapped tables (mode=name AND mode=id) resolve through
  per-file logical<-physical bindings shipped in the plan — mode=id
  binds by parquet footer field id, so renamed-footer vintages read
  correctly; unknown modes stay typed;
- reads are Arrow-batched per data file on executors (pyarrow scan of
  exactly one add file per InputPartition — the data plane never
  funnels through the driver).

Register per session, then read:

    from tulflow_spark.sources.lake_stream import DeltaChangesSource
    spark.dataSource.register(DeltaChangesSource)
    df = (spark.readStream.format("tulflow_delta_changes")
          .option("path", table_path)
          .option("startingVersion", "-1")   # -1 = deliver everything
          .load())

At 100 TB: `latestOffset` is one log listing; `partitions` replays
only the range's commit JSONs (O(new commits)); each task reads one
new data file. Nothing re-reads the table.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

class DeltaChangeFeedError(ValueError):
    """Typed failure for non-append-only ranges or a missing table."""


class _AddFilePartition(InputPartition):
    def __init__(self, scan_path: str, columns: list):
        self.scan_path = scan_path
        # per-output-column binding, in stream-schema order:
        #   ("file", logical, physical, pa|None)  — footer column,
        #       renamed; null-fills when ABSENT (add-column evolution:
        #       physical names are rename-stable, so a miss can only
        #       mean the file predates the column) — pa None means the
        #       type cannot null-fill and a miss stays typed
        #   ("lit", logical, value, pa)  — partition value injected
        #   ("null", logical, pa)        — column the file predates
        self.columns = columns


# Spark simpleString → pyarrow factory for partition-value injection:
# the injected array must carry the DECLARED type (pa.array would
# infer int64 for an int32 column and fail Arrow→Spark conversion; a
# null value would infer null type)
_PA_OF = {
    "tinyint": "int8", "smallint": "int16", "int": "int32",
    "bigint": "int64", "float": "float32", "double": "float64",
    "string": "string", "boolean": "bool_", "date": "date32",
    "timestamp": "timestamp_us",
}


def _pa_type(name: str):
    import pyarrow as pa

    if name == "timestamp_us":
        return pa.timestamp("us")
    return getattr(pa, name)()


def _batch_cap(options: dict, key: str) -> int | None:
    """Parse an admission-control option (commits per micro-batch)."""
    raw = options.get(key.lower(), options.get(key))
    if raw is None:
        return None
    cap = int(raw)
    if cap < 1:
        raise DeltaChangeFeedError(f"{key} must be >= 1, got {cap}")
    return cap


class DeltaChangesStreamReader(DataSourceStreamReader):
    """Admission control: ``maxVersionsPerBatch`` caps how many log
    versions a micro-batch may cover (the role of the Delta source's
    ``maxFilesPerTrigger`` — without it, a backlogged table lands its
    ENTIRE backlog in one batch on stream start or recovery).

    The cap base is the last PLANNED batch end, tracked through
    ``partitions()``: on a fresh stream the first ``latestOffset``
    arrives before ``initialOffset`` (observed engine order), so it
    falls back to ``startingVersion``; on restart the engine re-plans
    the recovered batch range through ``partitions()`` before asking
    for a new offset, which re-seeds the base — so every batch is
    capped, across restarts, without touching exactly-once (verified
    by the restart drain test).  ``latestOffset`` itself never
    advances the base: Spark may call it several times per trigger
    and a self-advancing base would run away uncapped."""

    _FMT = "tulflow_delta_changes"

    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise DeltaChangeFeedError(
                f"{self._FMT} needs .option('path', <table>)")
        self._schema = schema
        start = options.get("startingversion",
                            options.get("startingVersion"))
        self._starting = None if start is None else int(start)
        ts = options.get("startingtimestamp",
                         options.get("startingTimestamp"))
        self._starting_ts = None if ts is None else int(ts)
        if self._starting is not None and self._starting_ts is not None:
            raise DeltaChangeFeedError(
                "startingVersion and startingTimestamp are mutually "
                "exclusive")
        self._cap = _batch_cap(options, "maxVersionsPerBatch")
        end = options.get("endingversion",
                          options.get("endingVersion"))
        self._ending = None if end is None else int(end)
        ets = options.get("endingtimestamp",
                          options.get("endingTimestamp"))
        self._ending_ts = None if ets is None else int(ets)
        if self._ending is not None and self._ending_ts is not None:
            raise DeltaChangeFeedError(
                "endingVersion and endingTimestamp are mutually "
                "exclusive")
        self._last_end: int | None = None
        self._start_cache: int | None = None
        self._end_cache: int | None = None

    def _resolved_end(self) -> int | None:
        """endingVersion, or the endingTimestamp resolution (LATEST
        commit at or before it — the bound is inclusive): a bounded
        backfill stream delivers (start, end] and then stays idle, so
        one checkpointed query can replay an exact window through the
        streaming machinery."""
        if self._ending is not None:
            return self._ending
        if self._ending_ts is None:
            return None
        if self._end_cache is None:
            from tulflow_spark.ext.delta_log import (
                DeltaProtocolError,
                delta_version_as_of,
            )

            try:
                self._end_cache = delta_version_as_of(
                    self._path, self._ending_ts)
            except DeltaProtocolError as exc:
                raise DeltaChangeFeedError(str(exc)) from None
        return self._end_cache

    def _resolved_start(self) -> int | None:
        """The configured start offset (startingVersion, or the
        startingTimestamp resolution, cached) — the admission-control
        cap base before any batch has been planned.  Without this, a
        timestamp-configured stream's FIRST latestOffset (which can
        arrive before initialOffset) would return the uncapped head
        and land the whole backlog in batch one (r13 review
        finding)."""
        if self._starting is not None:
            return self._starting
        if self._starting_ts is None:
            return None
        if self._start_cache is None:
            from tulflow_spark.ext.delta_log import (
                DeltaProtocolError,
                delta_version_at_or_after,
            )

            try:
                self._start_cache = delta_version_at_or_after(
                    self._path, self._starting_ts) - 1
            except DeltaProtocolError as exc:
                raise DeltaChangeFeedError(str(exc)) from None
        return self._start_cache

    # -- offsets ------------------------------------------------------

    def initialOffset(self) -> dict:
        from tulflow_spark.ext.delta_log import latest_version

        latest = latest_version(self._path)
        if latest is None:
            raise DeltaChangeFeedError(
                f"no delta table at {self._path}")
        if self._starting is not None and not \
                -1 <= self._starting <= latest:
            raise DeltaChangeFeedError(
                f"startingVersion {self._starting} out of bounds "
                f"(latest is {latest})")
        # default: only data committed AFTER the stream starts;
        # startingVersion=-1 replays the whole table as batch one;
        # startingTimestamp resolves to the EARLIEST commit at or
        # after it (delta-spark semantics) and delivers from there
        if self._starting_ts is not None:
            off = self._resolved_start()
        elif self._starting is not None:
            off = self._starting
        else:
            off = latest
        self._last_end = off
        return {"version": off}

    def latestOffset(self) -> dict:
        from tulflow_spark.ext.delta_log import latest_version

        latest = latest_version(self._path)
        if latest is None:
            raise DeltaChangeFeedError(
                f"delta table vanished at {self._path}")
        if self._cap is not None:
            base = self._last_end
            if base is None:
                base = self._resolved_start()
            if base is not None:
                latest = min(latest, base + self._cap)
        end = self._resolved_end()
        if end is not None:
            latest = min(latest, end)
        return {"version": latest}

    # -- planning (driver-side, O(new commits)) -----------------------

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from pyspark.sql.types import StructType as _St

        from tulflow_spark.ext.delta_log import (
            DeltaProtocolError,
            _commit_actions,
            _list_log_versions,
            _partition_value,
            _replay,
            _scan_path,
        )

        lo, hi = int(start["version"]), int(end["version"])
        # a replayed (post-restart) batch re-seeds the cap base
        self._last_end = max(hi, self._last_end or hi)
        if hi <= lo:
            return []
        have = set(_list_log_versions(self._path))
        missing = [v for v in range(lo + 1, hi + 1) if v not in have]
        if missing:
            raise DeltaChangeFeedError(
                f"commits {missing[:5]} aged out below the checkpoint "
                "horizon: re-sync from a snapshot read")
        changed: dict[str, dict] = {}
        for v in range(lo + 1, hi + 1):
            for action in _commit_actions(self._path, v):
                add = action.get("add")
                if add and add.get("dataChange"):
                    changed[add["path"]] = add
                rm = action.get("remove")
                if rm and rm.get("dataChange"):
                    raise DeltaChangeFeedError(
                        f"commit {v} removes data (delete/overwrite): "
                        "the change set is not append-only — re-sync "
                        "from a snapshot read")
        # schema + partition columns from the snapshot at `hi`
        try:
            snap = _replay(None, self._path, hi)
        except DeltaProtocolError as exc:
            raise DeltaChangeFeedError(str(exc)) from None
        if snap.schema_str is None:
            raise DeltaChangeFeedError("table has no metaData schema")
        mode = (snap.configuration or {}).get(
            "delta.columnMapping.mode") or "none"
        if mode not in ("none", "name", "id"):
            raise DeltaChangeFeedError(
                f"column mapping mode {mode!r} not supported by the "
                "streaming source (use read_delta_changes)")
        # compacted-then-vacuumed guard (the batch API's typed wall):
        # a tombstoned file in the range may be gone from disk — fail
        # the batch here, not with an executor IOException mid-job
        from tulflow_spark import fsio as _fsio

        for raw in changed:
            if raw not in snap.live and not _fsio.exists(
                    _scan_path(self._path, raw)):
                raise DeltaChangeFeedError(
                    f"change range delivers {raw!r}, which was "
                    "compacted and vacuumed — re-sync from a snapshot "
                    "read")
        schema = _St.fromJson(json.loads(snap.schema_str))
        types = {f.name: f.dataType for f in schema.fields}
        part_cols = list(snap.partition_cols)
        unsupported = [c for c in part_cols
                       if types[c].simpleString() not in _PA_OF]
        if unsupported:
            raise DeltaChangeFeedError(
                f"partition column types {unsupported} not supported "
                "by the streaming source")
        # column-mapped tables: data files carry PHYSICAL names (and,
        # in id mode, footer field ids); partitionValues key
        # physically too.  The plan ships per-file logical<-physical
        # bindings so executors rename instead of misreading.
        if mode == "none":
            phys_of = {f.name: f.name for f in schema.fields}
            id_of = None
        else:
            from tulflow_spark.ext.delta_log import (
                DeltaProtocolError as _DPE,
            )
            from tulflow_spark.ext.delta_log import (
                _mapping_ids,
                _physical_names,
            )

            try:
                phys_of = _physical_names(snap)
                id_of = _mapping_ids(snap) if mode == "id" else None
            except _DPE as exc:
                raise DeltaChangeFeedError(str(exc)) from None
        part_set = set(part_cols)
        if mode == "id" and len(changed) > 1:
            from tulflow_spark import fsio as _f

            _f.prefetch_parquet_footers(
                [_scan_path(self._path, p) for p in changed])
        out: list[InputPartition] = []
        for p in sorted(changed):
            add = changed[p]
            pv = add.get("partitionValues") or {}
            fids = None
            if id_of is not None:
                from tulflow_spark.ext.delta_log import (
                    _footer_field_ids,
                )

                try:
                    fids = _footer_field_ids(self._path, p)
                except _DPE as exc:
                    raise DeltaChangeFeedError(str(exc)) from None
            columns: list = []
            bound: set = set()
            for f in schema.fields:
                st = types[f.name].simpleString()
                if f.name in part_set:
                    key = phys_of[f.name]
                    if key not in pv:
                        raise DeltaChangeFeedError(
                            f"add {p!r} missing partitionValues"
                            f"[{key!r}]")
                    columns.append((
                        "lit", f.name,
                        _partition_value(pv[key], types[f.name],
                                         f.name),
                        _PA_OF[st]))
                elif fids is not None:
                    ph = fids.get(id_of[f.name])
                    if ph is None:
                        if st not in _PA_OF:
                            raise DeltaChangeFeedError(
                                f"cannot null-fill column "
                                f"{f.name!r} of type {st!r}")
                        columns.append(("null", f.name, _PA_OF[st]))
                    else:
                        if ph in bound:
                            raise DeltaChangeFeedError(
                                f"add {p!r} binds two schema columns "
                                f"to footer column {ph!r} — ambiguous")
                        bound.add(ph)
                        columns.append(("file", f.name, ph,
                                        _PA_OF.get(st)))
                else:
                    columns.append(("file", f.name, phys_of[f.name],
                                    _PA_OF.get(st)))
            out.append(_AddFilePartition(
                _scan_path(self._path, p), columns))
        return out

    # -- executor-side read (Arrow batches, one file per task) --------

    def read(self, partition: _AddFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tulflow_spark import fsio

        fs, lp = fsio.resolve(partition.scan_path)
        with fs.open_input_file(lp) as handle:
            pf = pq.ParquetFile(handle)
            have = set(pf.schema_arrow.names)
            # a missing physical column means the file PREDATES the
            # column (physical names are rename-stable): null-fill,
            # matching read_delta_changes' batch semantics — typed
            # only when the type cannot express a null fill
            hard = [spec[2] for spec in partition.columns
                    if spec[0] == "file" and spec[2] not in have
                    and spec[3] is None]
            if hard:
                raise DeltaChangeFeedError(
                    f"data file {partition.scan_path!r} lacks "
                    f"columns {hard} whose types cannot null-fill — "
                    "re-sync from a snapshot read")
            for batch in pf.iter_batches():
                tbl = pa.Table.from_batches([batch])
                n = tbl.num_rows
                cols: dict = {}
                for spec in partition.columns:
                    if spec[0] == "file" and spec[2] in have:
                        # cast to the DECLARED type (the batch
                        # reader's explicit-schema rule): a foreign
                        # file storing a narrower physical type must
                        # not leak it into the stream (r13 review)
                        col = tbl.column(spec[2])
                        want = _pa_type(spec[3]) if spec[3] else None
                        if want is not None and col.type != want:
                            col = col.cast(want)
                        cols[spec[1]] = col
                    elif spec[0] == "lit":
                        cols[spec[1]] = pa.array(
                            [spec[2]] * n, type=_pa_type(spec[3]))
                    else:       # "null", or an absent file column
                        cols[spec[1]] = pa.nulls(
                            n, type=_pa_type(spec[3] if spec[0] ==
                                             "file" else spec[2]))
                yield from pa.table(cols).to_batches()

    def commit(self, end: dict) -> None:
        pass    # Spark's offset/commit logs own the progress state


class DeltaChangesSource(DataSource):
    """``spark.readStream.format("tulflow_delta_changes")``."""

    @classmethod
    def name(cls) -> str:
        return "tulflow_delta_changes"

    def schema(self):
        from pyspark.sql.types import StructType as _St

        from tulflow_spark.ext.delta_log import _replay, latest_version

        path = self.options.get("path")
        if not path:
            raise DeltaChangeFeedError(
                "tulflow_delta_changes needs .option('path', <table>)")
        latest = latest_version(path)
        if latest is None:
            raise DeltaChangeFeedError(f"no delta table at {path}")
        snap = _replay(None, path, latest)
        if snap.schema_str is None:
            raise DeltaChangeFeedError("table has no metaData schema")
        return _St.fromJson(json.loads(snap.schema_str))

    def streamReader(self, schema: StructType):
        return DeltaChangesStreamReader(schema, dict(self.options))


# ---------------------------------------------------------------------------
# CDF variant: full-fidelity change rows (_change_type-tagged), the
# streaming face of ext/delta_log.py::read_delta_cdf
# ---------------------------------------------------------------------------


class _CdfFilePartition(InputPartition):
    def __init__(self, scan_path: str, columns: list,
                 ctype: str | None, version: int,
                 positions: tuple | None, exclude: bool):
        self.scan_path = scan_path
        self.columns = columns      # table-column bindings, see
        self.ctype = ctype          # _AddFilePartition; ctype None =
        self.version = version      # read _change_type from the file
        self.positions = positions  # row indices (DV diff), or None
        self.exclude = exclude      # True: deliver all EXCEPT them


class DeltaCdfStreamReader(DeltaChangesStreamReader):
    """Streaming CHANGE DATA FEED source: micro-batches deliver the
    table's row-level changes — (table columns, ``_change_type``,
    ``_commit_version``) — for commits ``(start, end]``, resolved by
    the same driver-side planner as the batch
    :func:`~tulflow_spark.ext.delta_log.read_delta_cdf` (cdc files
    win, pure adds are inserts, full-file removes are survivor
    deletes, DV diffs split delete/insert, underivable rewrites fail
    the batch typed).  Offsets, admission control
    (``maxVersionsPerBatch``) and exactly-once recovery are inherited
    from the append-only reader — only planning and the executor read
    differ.

    Column-mapped tables resolve mode=name through physical bindings
    (rename-stable, so feeds crossing a rename deliver correctly);
    mode=id stays typed, matching the batch reader.

    At 100 TB: planning parses only the range's commit JSONs; each
    task Arrow-scans ONE cdc/data file; DV-diff row positions ship in
    the plan (vector-sized); the backlog drains in capped batches."""

    _FMT = "tulflow_delta_cdf"

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from pyspark.sql.types import StructType as _St

        from tulflow_spark import fsio as _fsio
        from tulflow_spark.ext.delta_log import (
            DeltaProtocolError,
            _cdf_plan,
            _list_log_versions,
            _mapping_mode,
            _partition_value,
            _physical_names,
            _replay,
            _scan_path,
        )

        lo, hi = int(start["version"]), int(end["version"])
        # a replayed (post-restart) batch re-seeds the cap base
        self._last_end = max(hi, self._last_end or hi)
        if hi <= lo:
            return []
        have = set(_list_log_versions(self._path))
        missing = [v for v in range(lo + 1, hi + 1) if v not in have]
        if missing:
            raise DeltaChangeFeedError(
                f"commits {missing[:5]} aged out below the checkpoint "
                "horizon: re-sync from a snapshot read")
        try:
            plan = _cdf_plan(self._path, lo, hi)
            snap = _replay(None, self._path, hi)
        except DeltaProtocolError as exc:
            raise DeltaChangeFeedError(str(exc)) from None
        if snap.schema_str is None:
            raise DeltaChangeFeedError("table has no metaData schema")
        mode = _mapping_mode(snap)
        if mode not in ("none", "name"):
            raise DeltaChangeFeedError(
                f"change feed on column mapping mode={mode!r} not "
                "supported (mode='name' and unmapped tables are)")
        schema = _St.fromJson(json.loads(snap.schema_str))
        if mode == "name":
            try:
                phys_of = _physical_names(snap)
            except DeltaProtocolError as exc:
                raise DeltaChangeFeedError(str(exc)) from None
        else:
            phys_of = {f.name: f.name for f in schema.fields}
        types = {f.name: f.dataType for f in schema.fields}
        part_cols = list(snap.partition_cols)
        unsupported = [c for c in part_cols
                       if types[c].simpleString() not in _PA_OF]
        if unsupported:
            raise DeltaChangeFeedError(
                f"partition column types {unsupported} not supported "
                "by the streaming source")
        part_set = set(part_cols)
        import pyarrow.parquet as _pq

        out: list[InputPartition] = []
        for rec in plan:
            if rec[0] == "cdc":
                act, v = rec[1], rec[2]
                ctype, positions, exclude = None, None, False
            else:
                _, act, ctype, v, positions, exclude = rec
            sp = _scan_path(self._path, act["path"])
            if not _fsio.exists(sp):
                raise DeltaChangeFeedError(
                    f"change feed needs {act['path']!r}, which was "
                    "vacuumed — re-sync from a snapshot read")
            if ctype is None:
                # cdc file: _change_type MUST come from the file — an
                # absent column would silently null every change type
                fs_, lp_ = _fsio.resolve(sp)
                with fs_.open_input_file(lp_) as handle:
                    fnames = set(
                        _pq.ParquetFile(handle).schema_arrow.names)
                if "_change_type" not in fnames:
                    raise DeltaChangeFeedError(
                        f"cdc file {act['path']!r} has no "
                        "_change_type column")
            pv = act.get("partitionValues") or {}
            columns: list = []
            for f in schema.fields:
                st = types[f.name].simpleString()
                ph = phys_of[f.name]
                if f.name in part_set:
                    if ph not in pv:
                        raise DeltaChangeFeedError(
                            f"action for {act['path']!r} is missing "
                            f"partitionValues[{ph!r}]")
                    columns.append((
                        "lit", f.name,
                        _partition_value(pv[ph], types[f.name],
                                         f.name), _PA_OF[st]))
                else:
                    columns.append(("file", f.name, ph,
                                    _PA_OF.get(st)))
            out.append(_CdfFilePartition(sp, columns, ctype, v,
                                         positions, exclude))
        return out

    def read(self, partition: _CdfFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tulflow_spark import fsio

        pos = None if partition.positions is None \
            else set(partition.positions)
        fs, lp = fsio.resolve(partition.scan_path)
        with fs.open_input_file(lp) as handle:
            pf = pq.ParquetFile(handle)
            have = set(pf.schema_arrow.names)
            hard = [spec[2] for spec in partition.columns
                    if spec[0] == "file" and spec[2] not in have
                    and spec[3] is None]
            if hard:
                raise DeltaChangeFeedError(
                    f"data file {partition.scan_path!r} lacks "
                    f"columns {hard} whose types cannot null-fill — "
                    "re-sync from a snapshot read")
            offset = 0
            for batch in pf.iter_batches():
                tbl = pa.Table.from_batches([batch])
                n = tbl.num_rows
                if pos is not None:
                    keep = [i for i in range(n)
                            if ((offset + i) in pos)
                            != partition.exclude]
                    if len(keep) != n:
                        tbl = tbl.take(pa.array(keep, pa.int32()))
                offset += n
                m = tbl.num_rows
                if m == 0:
                    continue
                cols: dict = {}
                for spec in partition.columns:
                    if spec[0] == "file" and spec[2] in have:
                        col = tbl.column(spec[2])
                        want = _pa_type(spec[3]) if spec[3] else None
                        if want is not None and col.type != want:
                            col = col.cast(want)
                        cols[spec[1]] = col
                    elif spec[0] == "lit":
                        cols[spec[1]] = pa.array(
                            [spec[2]] * m, type=_pa_type(spec[3]))
                    else:   # file column the vintage predates
                        cols[spec[1]] = pa.nulls(
                            m, type=_pa_type(spec[3]))
                if partition.ctype is None:
                    ct = tbl.column("_change_type")
                    if ct.type != pa.string():
                        ct = ct.cast(pa.string())
                    cols["_change_type"] = ct
                else:
                    cols["_change_type"] = pa.array(
                        [partition.ctype] * m, type=pa.string())
                cols["_commit_version"] = pa.array(
                    [partition.version] * m, type=pa.int64())
                yield from pa.table(cols).to_batches()


class DeltaCdfSource(DataSource):
    """``spark.readStream.format("tulflow_delta_cdf")`` — the
    streaming change-data-feed source (append-only tables AND
    delete/merge/DV commits, delivered as typed change rows)."""

    @classmethod
    def name(cls) -> str:
        return "tulflow_delta_cdf"

    def schema(self):
        from pyspark.sql.types import LongType, StringType, StructField
        from pyspark.sql.types import StructType as _St

        from tulflow_spark.ext.delta_log import _replay, latest_version

        path = self.options.get("path")
        if not path:
            raise DeltaChangeFeedError(
                "tulflow_delta_cdf needs .option('path', <table>)")
        latest = latest_version(path)
        if latest is None:
            raise DeltaChangeFeedError(f"no delta table at {path}")
        snap = _replay(None, path, latest)
        if snap.schema_str is None:
            raise DeltaChangeFeedError("table has no metaData schema")
        return _St(
            list(_St.fromJson(json.loads(snap.schema_str)).fields)
            + [StructField("_change_type", StringType()),
               StructField("_commit_version", LongType())])

    def streamReader(self, schema: StructType):
        return DeltaCdfStreamReader(schema, dict(self.options))


# ---------------------------------------------------------------------------
# Iceberg variant: offsets are SEQUENCE NUMBERS (snapshot ids are
# random 64-bit longs and carry no order)
# ---------------------------------------------------------------------------


class IcebergChangesStreamReader(DataSourceStreamReader):
    """Admission control mirrors the Delta reader:
    ``maxSequencesPerBatch`` caps how many commits (sequence numbers)
    one micro-batch may cover; the cap base seeds from
    ``startingSequence`` on a fresh stream and re-seeds from the
    engine's recovered-batch ``partitions()`` call on restart."""

    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise DeltaChangeFeedError(
                "tulflow_iceberg_changes needs .option('path', <table>)")
        self._schema = schema
        start = options.get("startingsequence",
                            options.get("startingSequence"))
        self._starting = None if start is None else int(start)
        ts = options.get("startingtimestamp",
                         options.get("startingTimestamp"))
        self._starting_ts = None if ts is None else int(ts)
        if self._starting is not None and self._starting_ts is not None:
            raise DeltaChangeFeedError(
                "startingSequence and startingTimestamp are mutually "
                "exclusive")
        self._cap = _batch_cap(options, "maxSequencesPerBatch")
        end = options.get("endingsequence",
                          options.get("endingSequence"))
        self._ending = None if end is None else int(end)
        ets = options.get("endingtimestamp",
                          options.get("endingTimestamp"))
        self._ending_ts = None if ets is None else int(ets)
        if self._ending is not None and self._ending_ts is not None:
            raise DeltaChangeFeedError(
                "endingSequence and endingTimestamp are mutually "
                "exclusive")
        self._last_end: int | None = None
        self._start_cache: int | None = None
        self._end_cache: int | None = None

    def _resolved_end(self) -> int | None:
        """endingSequence, or the endingTimestamp resolution (the
        LATEST snapshot at or before it, inclusive) — the bounded-
        backfill window bound, mirroring the Delta reader."""
        if self._ending is not None:
            return self._ending
        if self._ending_ts is None:
            return None
        if self._end_cache is None:
            from tulflow_spark.ext.iceberg import load_table_metadata

            meta = load_table_metadata(self._path)
            hit = [s for s in self._ordered_snaps(meta)
                   if int(s.get("timestamp-ms") or 0)
                   <= self._ending_ts]
            if not hit:
                raise DeltaChangeFeedError(
                    f"no snapshot at or before {self._ending_ts} "
                    "(it is before the first snapshot's timestamp)")
            self._end_cache = self._seq_of(hit[-1])
        return self._end_cache

    @staticmethod
    def _seq_of(s: dict) -> int:
        # NOT `or`-chained: sequence-number 0 is a legal spec value
        # (pre-upgrade v1 snapshots) and must not fall back to the
        # epoch-millisecond timestamp
        if s.get("sequence-number") is not None:
            return int(s["sequence-number"])
        return int(s.get("timestamp-ms") or 0)

    @classmethod
    def _ordered_snaps(cls, meta: dict) -> list[dict]:
        return sorted((s for s in meta.get("snapshots") or []),
                      key=cls._seq_of)

    def _latest_seq(self) -> int:
        from tulflow_spark.ext.iceberg import load_table_metadata

        meta = load_table_metadata(self._path)
        snaps = self._ordered_snaps(meta)
        if not snaps:
            return 0
        # the feed follows the MAIN branch: offsets advance to the
        # current snapshot's sequence, not the global max — a branch
        # ref ahead of main must not pull branch-only sequence numbers
        # into a planned range (r14 advice)
        cur = meta.get("current-snapshot-id")
        head = next((s for s in snaps if s["snapshot-id"] == cur), None)
        return self._seq_of(head if head is not None else snaps[-1])

    def _resolved_start(self) -> int | None:
        """startingSequence, or the cached startingTimestamp
        resolution — the admission-control cap base before any batch
        is planned (mirrors the Delta reader, r13 review finding)."""
        if self._starting is not None:
            return max(0, self._starting)
        if self._starting_ts is None:
            return None
        if self._start_cache is None:
            # EARLIEST snapshot committed at or after the timestamp
            # (the Delta reader's startingTimestamp semantics, through
            # the snapshots' own timestamps); typed when the timestamp
            # is after the whole history.  No max(0, ...) clamp: a
            # pre-upgrade seq-0 snapshot needs offset -1 to deliver
            from tulflow_spark.ext.iceberg import load_table_metadata

            meta = load_table_metadata(self._path)
            hit = [s for s in self._ordered_snaps(meta)
                   if int(s.get("timestamp-ms") or 0)
                   >= self._starting_ts]
            if not hit:
                raise DeltaChangeFeedError(
                    f"no snapshot at or after {self._starting_ts} "
                    "(it is after the latest snapshot's timestamp)")
            self._start_cache = self._seq_of(hit[0]) - 1
        return self._start_cache

    def initialOffset(self) -> dict:
        start = self._resolved_start()
        off = self._latest_seq() if start is None else start
        self._last_end = off
        return {"seq": off}

    def latestOffset(self) -> dict:
        latest = self._latest_seq()
        # cap against the last PLANNED batch end (see the Delta reader)
        if self._cap is not None:
            base = self._last_end
            if base is None:
                base = self._resolved_start()
            if base is not None:
                latest = min(latest, base + self._cap)
        end = self._resolved_end()
        if end is not None:
            latest = min(latest, end)
        return {"seq": latest}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from tulflow_spark.ext.iceberg import (
            IcebergError,
            _manifest_entries,
            _read_manifest,
            load_table_metadata,
        )

        lo, hi = int(start["seq"]), int(end["seq"])
        # a replayed (post-restart) batch re-seeds the cap base
        self._last_end = max(hi, self._last_end or hi)
        if hi <= lo:
            return []
        try:
            meta = load_table_metadata(self._path)
        except IcebergError as exc:
            raise DeltaChangeFeedError(str(exc)) from None
        snaps = self._ordered_snaps(meta)
        in_range = [s for s in snaps if lo < self._seq_of(s) <= hi]
        if not in_range:
            # hi > lo means snapshots WERE committed in this range;
            # their absence from the metadata means expiration removed
            # them — committing an empty batch would silently drop
            # their rows forever
            raise DeltaChangeFeedError(
                f"snapshots in range ({lo}, {hi}] expired from the "
                "table metadata — re-sync from a snapshot read")
        seqs = {self._seq_of(s) for s in in_range
                if s.get("sequence-number") is not None}
        if seqs and seqs != set(range(lo + 1, hi + 1)):
            # v2 sequence numbers increment by one per commit: a gap
            # means PART of the range was expired
            raise DeltaChangeFeedError(
                f"range ({lo}, {hi}] is missing expired snapshots "
                f"(have sequences {sorted(seqs)}) — re-sync from a "
                "snapshot read")
        for s in in_range:
            op = (s.get("summary") or {}).get("operation")
            if op is not None and op != "append":
                raise DeltaChangeFeedError(
                    f"snapshot {s['snapshot-id']} is {op!r}: not "
                    "append-only — re-sync from a snapshot read")
        ids = {s["snapshot-id"] for s in in_range}
        added: list[tuple[str, str]] = []
        try:
            for mf in _manifest_entries(in_range[-1]):
                mf_snap = mf.get("added_snapshot_id")
                if mf_snap is not None and mf_snap not in ids:
                    continue
                mpath, entries = _read_manifest(mf)
                for e in entries:
                    sid = e.get("snapshot_id")
                    own = sid is None or sid in ids
                    if e.get("status") == 2 and own:
                        raise DeltaChangeFeedError(
                            f"manifest {mpath!r} tombstones files in "
                            "range (rewrite): not append-only")
                    if e.get("status") != 1 or not own:
                        continue
                    dfile = e.get("data_file") or {}
                    if int(dfile.get("content") or 0) != 0:
                        raise DeltaChangeFeedError(
                            "delete files in range: not append-only")
                    fmt = str(dfile.get("file_format") or "").upper()
                    if fmt not in ("PARQUET", "ORC"):
                        raise DeltaChangeFeedError(
                            f"data file format {fmt!r} not supported "
                            "(PARQUET and ORC are)")
                    added.append((dfile["file_path"], fmt))
        except IcebergError as exc:
            raise DeltaChangeFeedError(str(exc)) from None
        if len(added) > 1:
            from tulflow_spark import fsio as _f
            from tulflow_spark.ext.iceberg import _plain_path as _pp

            _f.prefetch_parquet_footers(
                [_pp(p) for p, f2 in added if f2 != "ORC"])
        return [
            _IceFilePartition(fp, fmt, self._bindings(meta, fp, fmt))
            for fp, fmt in added
        ]

    def _bindings(self, meta: dict, file_path: str, fmt: str) -> list:
        """Per-file logical<-physical column bindings (mirrors the
        batch reader's field-id resolution): parquet files bind by
        footer FIELD ID (renamed/reordered vintages read correctly,
        absent ids null-fill as add-column evolution), id-less files
        bind by name, ORC stays name-bound; a name-miss on an id-less
        file is typed — Spark binds returned batches positionally and
        a silent mismatch would swap same-typed columns."""
        from tulflow_spark import fsio as _f
        from tulflow_spark.ext.iceberg import (
            IcebergError,
            _current_schema,
            _plain_path,
        )

        try:
            cur = _current_schema(meta)
        except IcebergError as exc:
            raise DeltaChangeFeedError(str(exc)) from None
        id_by_name = {f["name"]: int(f["id"])
                      for f in cur.get("fields", [])
                      if f.get("id") is not None}
        if fmt == "ORC":
            fmap: dict[int, str] = {}
        else:
            try:
                _, fids = _f.parquet_footer_fields(
                    _plain_path(file_path))
            except ValueError as exc:
                raise DeltaChangeFeedError(str(exc)) from None
            fmap = dict(fids)
        cols: list = []
        bound: set = set()
        for f in self._schema.fields:
            st = f.dataType.simpleString()
            fid = id_by_name.get(f.name)
            ph = fmap.get(fid) if (fid is not None and fmap) else None
            if ph is None and not fmap:
                ph = f.name     # id-less file (or ORC): name-bound
            if ph is None:
                if st not in _PA_OF:
                    raise DeltaChangeFeedError(
                        f"cannot null-fill column {f.name!r} of "
                        f"type {st!r}")
                cols.append(("null", f.name, _PA_OF[st]))
                continue
            if ph in bound:
                raise DeltaChangeFeedError(
                    f"data file {file_path!r} binds two schema "
                    f"columns to footer column {ph!r} — ambiguous")
            bound.add(ph)
            cols.append(("file", f.name, ph, None))
        return cols

    def read(self, partition: "_IceFilePartition"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tulflow_spark import fsio
        from tulflow_spark.ext.iceberg import _plain_path

        def emit(tbl):
            have = set(tbl.column_names)
            hard = [s[2] for s in partition.columns
                    if s[0] == "file" and s[2] not in have]
            if hard:
                raise DeltaChangeFeedError(
                    f"data file {partition.file_path!r} lacks stream "
                    f"schema columns {hard} (renamed/dropped columns "
                    "need field-id resolution) — re-sync from a "
                    "snapshot read")
            n = tbl.num_rows
            cols: dict = {}
            for spec in partition.columns:
                if spec[0] == "file":
                    cols[spec[1]] = tbl.column(spec[2])
                else:                       # "null": added column
                    cols[spec[1]] = pa.nulls(n, type=_pa_type(spec[2]))
            yield from pa.table(cols).to_batches()

        fs, lp = fsio.resolve(_plain_path(partition.file_path))
        with fs.open_input_file(lp) as handle:
            if partition.file_format == "ORC":
                import pyarrow.orc as po

                yield from emit(po.read_table(handle))
            else:
                pf = pq.ParquetFile(handle)
                for batch in pf.iter_batches():
                    yield from emit(pa.Table.from_batches([batch]))

    def commit(self, end: dict) -> None:
        pass


class IcebergChangesSource(DataSource):
    """``spark.readStream.format("tulflow_iceberg_changes")``."""

    @classmethod
    def name(cls) -> str:
        return "tulflow_iceberg_changes"

    def schema(self):
        from pyspark.sql.types import (
            BinaryType,
            BooleanType,
            DateType,
            DoubleType,
            FloatType,
            IntegerType,
            LongType,
            StringType,
            StructField,
        )
        from pyspark.sql.types import StructType as _St

        from tulflow_spark.ext.iceberg import (
            _current_schema,
            load_table_metadata,
        )

        path = self.options.get("path")
        if not path:
            raise DeltaChangeFeedError(
                "tulflow_iceberg_changes needs .option('path', <table>)")
        spark_of = {"long": LongType(), "int": IntegerType(),
                    "string": StringType(), "double": DoubleType(),
                    "float": FloatType(), "boolean": BooleanType(),
                    "binary": BinaryType(), "date": DateType()}
        fields = []
        for f in _current_schema(load_table_metadata(path)).get(
                "fields", []):
            t = f.get("type")
            if not isinstance(t, str) or t not in spark_of:
                raise DeltaChangeFeedError(
                    f"column {f.get('name')!r} type {t!r} not "
                    "supported by the streaming source")
            fields.append(StructField(f["name"], spark_of[t],
                                      not f.get("required", False)))
        return _St(fields)

    def streamReader(self, schema: StructType):
        return IcebergChangesStreamReader(schema, dict(self.options))


class _IceFilePartition(InputPartition):
    def __init__(self, file_path: str, file_format: str,
                 columns: list):
        self.file_path = file_path
        self.file_format = file_format
        # ("file", logical, physical, None) | ("null", logical, pa)
        self.columns = columns


class _IceCdfPartition(InputPartition):
    def __init__(self, file_path: str, file_format: str,
                 columns: list, ctype: str, seq: int, sid: int,
                 positions: tuple | None, exclude: bool):
        self.file_path = file_path
        self.file_format = file_format
        self.columns = columns      # bindings, see _IceFilePartition
        self.ctype = ctype          # insert | delete
        self.seq = seq
        self.sid = sid
        self.positions = positions  # row indices, or None
        self.exclude = exclude      # True: deliver all EXCEPT them


class IcebergCdfStreamReader(IcebergChangesStreamReader):
    """Streaming CHANGELOG source: micro-batches deliver the Iceberg
    table's row-level changes — (table columns, ``_change_type``
    insert/delete, ``_commit_seq``, ``_snapshot_id``) — for sequence
    numbers ``(start, end]``, resolved by the batch
    :func:`~tulflow_spark.ext.iceberg.read_iceberg_cdf` rules
    restricted to the POSITION-resolvable subset: appends deliver
    added files' alive rows, whole-file removals deliver survivors,
    position-delete/DV set changes deliver the per-file pair DIFF in
    both directions (newly-dead delete, resurrected insert — the
    restore_iceberg shape), ``replace`` compactions contribute
    nothing.  EQUALITY deletes (the ``merge_iceberg`` / Flink-CDC
    write shape) are pre-resolved to positions in the PLANNER for
    delete sets up to ``maxEqualityDeleteRows`` total rows (r15,
    closing the last CDC asymmetry — the engine's own merge output
    now streams through its own changelog source): each state's
    eq-victims fold into its dead-position map, so arriving deletes
    surface as newly-dead positions, departing ones (restore) as
    resurrections, with overlap deduped by the position sets
    themselves.  Above the threshold the batch fails typed — compact
    with ``rewrite_iceberg_data_files``, raise the option, or consume
    the range through the batch changelog.

    At 100 TB: planning is O(range snapshots) manifest walks plus
    pair-set reads of the position-delete/DV files (vector-sized,
    driver-side — the same frames the batch planner diffs); each
    task Arrow-scans ONE data file with its positions shipped in the
    plan; side-branch snapshots never deliver (main-lineage walk).
    Equality resolution reads the delete files (threshold-bounded)
    plus the EQUALITY-KEY COLUMNS of candidate data files
    (manifest-bounds-pruned, memoized across the range) on the
    driver — the typed wall exists precisely because that scan grows
    with the un-compacted candidate set, not the change set."""

    _EQ_ROWS_DEFAULT = 4096

    def __init__(self, schema, options: dict):
        super().__init__(schema, options)
        cap = options.get("maxequalitydeleterows",
                          options.get("maxEqualityDeleteRows"))
        self._eq_cap = self._EQ_ROWS_DEFAULT if cap is None \
            else int(cap)

    def _eq_dead_map(self, meta: dict, snap: dict | None,
                     eq_dels: list[dict], data_files: list[dict],
                     memo: dict) -> dict:
        """Equality-delete victims of ONE state resolved driver-side
        to {normalized data path → dead row positions}.

        Per delete file: read its key values once (memoized), then
        scan the equality-key columns of candidate data files —
        sequence-strict, partition-scoped, manifest-bounds-pruned
        before any data IO, per-(delete, data-file) victim sets
        memoized across the range's states so a delete live across V
        snapshots costs one scan, not V."""
        import re as _re

        import pyarrow.parquet as _pq

        from tulflow_spark import fsio as _f
        from tulflow_spark.ext.iceberg import (
            IcebergError,
            _eq_part_applies,
            _manifest_value_bounds,
            _plain_path,
            _prune_eq_candidates,
            _schema_for,
        )

        pn = lambda p: _re.sub("^file:/+", "/", p)  # noqa: E731
        try:
            schema = _schema_for(meta, snap)
        except IcebergError as exc:
            raise DeltaChangeFeedError(str(exc)) from None
        by_id = {int(f["id"]): (f["name"], f.get("type"))
                 for f in schema.get("fields", [])}
        out: dict = {}
        for d in sorted(eq_dels, key=lambda d: str(d["file_path"])):
            ids_ = [int(i) for i in (d.get("equality_ids") or [])]
            if not ids_ or any(i not in by_id for i in ids_):
                raise DeltaChangeFeedError(
                    f"equality delete with unknown equality_ids "
                    f"{ids_} — consume through batch read_iceberg_cdf")
            names = [by_id[i][0] for i in ids_]
            types = [by_id[i][1] for i in ids_]
            dseq = d.get("__seq")
            if dseq is None:
                raise DeltaChangeFeedError(
                    "equality delete without a sequence number")
            part = d.get("partition") or {}
            cands = []
            for c in data_files:
                if c.get("__seq") is None \
                        or int(c["__seq"]) >= int(dseq):
                    continue
                # subset semantics, matching the batch scan path —
                # exact-dict equality would drop files whose partition
                # struct carries extra keys (spec evolution)
                if not _eq_part_applies(part, c.get("partition")):
                    continue
                cands.append(c)
            # manifest-bounds pre-prune (r15): our eq-delete writer
            # records the delete VALUES' min/max on the manifest
            # entry, so candidates provably disjoint from them drop
            # here — and when none survive, the delete parquet is
            # never read at all (planning stays metadata-sized)
            cands = _prune_eq_candidates(
                cands, ids_, types,
                _manifest_value_bounds(d, ids_, types))
            if not cands:
                continue
            vkey = ("eqvals", d["file_path"])
            if vkey not in memo:
                fs_, lp_ = _f.resolve(_plain_path(d["file_path"]))
                with fs_.open_input_file(lp_) as h:
                    vt = _pq.read_table(h, columns=names)
                cols = [vt.column(n).to_pylist() for n in names]
                vals = set(zip(*cols)) if vt.num_rows else set()
                bounds = []
                for col in cols:
                    nn = [x for x in col if x is not None]
                    # a NULL delete value matches file NULLs, which
                    # min/max pruning cannot see — any null in the
                    # column disables its bounds (r15 soundness fix;
                    # the manifest-bounds writer applies the same
                    # rule at stage time)
                    bounds.append((min(nn), max(nn))
                                  if nn and len(nn) == len(col)
                                  else None)
                memo[vkey] = (vals, bounds)
            vals, bounds = memo[vkey]
            if not vals:
                continue
            for c in _prune_eq_candidates(cands, ids_, types, bounds):
                ckey = ("eqvict", d["file_path"], c["file_path"])
                if ckey not in memo:
                    if str(c.get("file_format") or "").upper() \
                            != "PARQUET":
                        raise DeltaChangeFeedError(
                            "equality deletes over non-parquet data "
                            "files not supported in the stream — "
                            "consume through batch read_iceberg_cdf")
                    fs_, lp_ = _f.resolve(_plain_path(c["file_path"]))
                    with fs_.open_input_file(lp_) as h:
                        pf = _pq.ParquetFile(h)
                        have = set(pf.schema_arrow.names)
                        if not set(names) <= have:
                            raise DeltaChangeFeedError(
                                f"data file {c['file_path']!r} lacks "
                                f"equality columns "
                                f"{sorted(set(names) - have)} "
                                "(schema-evolved physical layout) — "
                                "consume through batch "
                                "read_iceberg_cdf")
                        dt = pf.read(columns=names)
                    dcols = [dt.column(n).to_pylist() for n in names]
                    memo[ckey] = {
                        i for i, tu in enumerate(zip(*dcols))
                        if tu in vals} if dt.num_rows else set()
                if memo[ckey]:
                    out.setdefault(pn(_plain_path(c["file_path"])),
                                   set()).update(memo[ckey])
        return out

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        import re as _re

        from tulflow_spark import fsio as _f
        from tulflow_spark.ext.iceberg import (
            IcebergError,
            _live_files,
            _plain_path,
            _read_dv_map,
            load_table_metadata,
        )

        lo, hi = int(start["seq"]), int(end["seq"])
        self._last_end = max(hi, self._last_end or hi)
        if hi <= lo:
            return []
        try:
            meta = load_table_metadata(self._path)
        except IcebergError as exc:
            raise DeltaChangeFeedError(str(exc)) from None
        snaps = self._ordered_snaps(meta)
        in_range = [s for s in snaps if lo < self._seq_of(s) <= hi]
        # main-lineage restriction FIRST (the batch reader's
        # side-branch rule, ordered per r14 advice): snapshots
        # reachable only through branch refs must neither deliver nor
        # satisfy the completeness check below — a branch snapshot
        # filling a sequence gap would mask an expired main-lineage
        # snapshot in that gap.  A parentless head is a single-node
        # lineage, not "no filter".
        by_sid = {s["snapshot-id"]: s for s in snaps}
        cur_sid = meta.get("current-snapshot-id")
        head = by_sid.get(cur_sid)
        if head is not None:
            lineage, cur, seen = set(), head, set()
            while cur is not None and cur["snapshot-id"] not in seen:
                seen.add(cur["snapshot-id"])
                lineage.add(cur["snapshot-id"])
                pid = cur.get("parent-snapshot-id")
                cur = by_sid.get(pid) if pid is not None else None
            in_range = [s for s in in_range
                        if s["snapshot-id"] in lineage]
        if not in_range:
            raise DeltaChangeFeedError(
                f"snapshots in range ({lo}, {hi}] expired from the "
                "table metadata — re-sync from a snapshot read")
        seqs = {self._seq_of(s) for s in in_range
                if s.get("sequence-number") is not None}
        if seqs and seqs != set(range(lo + 1, hi + 1)):
            raise DeltaChangeFeedError(
                f"range ({lo}, {hi}] is missing expired snapshots "
                f"(have sequences {sorted(seqs)}) — re-sync from a "
                "snapshot read")

        pn = lambda p: _re.sub("^file:/+", "/", p)  # noqa: E731

        def pair_map(dels: list[dict]) -> dict:
            """normalized data path → set of dead row positions, from
            position-delete parquet + v3 DV blobs (driver-side,
            vector-sized)."""
            import pyarrow.parquet as _pq

            out: dict = {}
            pos = [d for d in dels
                   if int(d.get("content") or 0) == 1
                   and str(d.get("file_format") or "").upper()
                   != "PUFFIN"]
            dvs = [d for d in dels
                   if int(d.get("content") or 0) == 1
                   and str(d.get("file_format") or "").upper()
                   == "PUFFIN"]
            for d in pos:
                fs_, lp_ = _f.resolve(_plain_path(d["file_path"]))
                with fs_.open_input_file(lp_) as handle:
                    t = _pq.read_table(handle,
                                       columns=["file_path", "pos"])
                for fp, p in zip(t.column("file_path").to_pylist(),
                                 t.column("pos").to_pylist()):
                    out.setdefault(pn(str(fp)), set()).add(int(p))
            try:
                for ref, arr in _read_dv_map(dvs).items():
                    out.setdefault(pn(str(ref)), set()).update(
                        int(x) for x in arr)
            except IcebergError as exc:
                raise DeltaChangeFeedError(str(exc)) from None
            return out

        parts: list[InputPartition] = []
        # rolling prior state: a batch of V consecutive snapshots
        # costs O(V) manifest walks + pair reads, not O(2V) — each
        # iteration's CURRENT state becomes the next one's PREV when
        # the parent chain is consecutive (the _cdf_plan precedent)
        roll: tuple | None = None       # (sid, data, dels, pairs)
        # equality-resolution memo shared across the range's states:
        # eq value sets and per-(delete, data-file) victim sets
        eq_memo: dict = {}
        eq_rows_seen: dict[str, int] = {}
        for s in in_range:
            sid = s["snapshot-id"]
            seq = self._seq_of(s)
            op = (s.get("summary") or {}).get("operation")
            if op == "replace":
                # row-preserving by contract — but it may still SWAP
                # file sets, so the rolling state must not skip it
                roll = None
                continue
            if op not in ("append", "delete", "overwrite", None):
                raise DeltaChangeFeedError(
                    f"changelog: snapshot {sid} operation {op!r} "
                    "not supported")
            prev_sid = s.get("parent-snapshot-id")
            try:
                if roll is not None and roll[0] == prev_sid:
                    data_prev, dels_prev, prev_pairs_c = roll[1:]
                else:
                    data_prev, dels_prev = (
                        _live_files(meta, prev_sid)
                        if prev_sid is not None else ([], []))
                    prev_pairs_c = None
                data_s, dels_s = _live_files(meta, sid)
            except IcebergError as exc:
                raise DeltaChangeFeedError(str(exc)) from None
            eq_prev = [d for d in dels_prev
                       if int(d.get("content") or 0) == 2]
            eq_cur = [d for d in dels_s
                      if int(d.get("content") or 0) == 2]
            for d in eq_prev + eq_cur:
                p = str(d["file_path"])
                if p not in eq_rows_seen:
                    eq_rows_seen[p] = int(d.get("record_count") or 0)
            total_eq = sum(eq_rows_seen.values())
            if total_eq > self._eq_cap:
                raise DeltaChangeFeedError(
                    f"range carries {total_eq} EQUALITY-delete rows "
                    f"(> maxEqualityDeleteRows={self._eq_cap}): "
                    "resolving their victims in the planner would "
                    "scan the un-compacted candidate set driver-side "
                    "— compact with rewrite_iceberg_data_files, raise "
                    "the option, or consume this range through the "
                    "batch read_iceberg_cdf")
            dp = {pn(_plain_path(d["file_path"])): d
                  for d in data_prev}
            dc = {pn(_plain_path(d["file_path"])): d for d in data_s}
            prev_del_paths = {d["file_path"] for d in dels_prev}
            cur_del_paths = {d["file_path"] for d in dels_s}
            dels_changed = (
                any(d["file_path"] not in prev_del_paths
                    for d in dels_s)
                or any(d["file_path"] not in cur_del_paths
                       for d in dels_prev))
            if op is None and (set(dp) - set(dc) or dels_changed):
                raise DeltaChangeFeedError(
                    f"snapshot {sid} removes files or changes delete "
                    "files without a summary.operation — cannot "
                    "distinguish compaction from overwrite")
            prev_pairs = prev_pairs_c if prev_pairs_c is not None \
                else (pair_map(dels_prev) if dels_prev else {})
            cur_pairs = pair_map(dels_s) if dels_s else {}
            # fold each state's equality-delete victims into its
            # dead-position map (r15): the position diff below then
            # delivers arriving-delete victims as newly-dead rows and
            # departing ones (restore) as resurrections, and a rolled
            # state already carries its own eq-victims forward
            if eq_prev and prev_pairs_c is None:
                prev_snap = by_sid.get(prev_sid) or s
                for k, v in self._eq_dead_map(
                        meta, prev_snap, eq_prev, data_prev,
                        eq_memo).items():
                    prev_pairs.setdefault(k, set()).update(v)
            if eq_cur:
                for k, v in self._eq_dead_map(
                        meta, s, eq_cur, data_s, eq_memo).items():
                    cur_pairs.setdefault(k, set()).update(v)
            roll = (sid, data_s, dels_s, cur_pairs)

            def mk(path_key, d, ctype, positions, exclude):
                fmt = str(d.get("file_format") or "").upper()
                if fmt not in ("PARQUET", "ORC"):
                    raise DeltaChangeFeedError(
                        f"data file format {fmt!r} not supported")
                parts.append(_IceCdfPartition(
                    d["file_path"], fmt,
                    self._bindings(meta, d["file_path"], fmt),
                    ctype, seq, sid,
                    tuple(sorted(positions)) if positions else None,
                    exclude))

            for pkey in sorted(set(dc) - set(dp)):
                dead = cur_pairs.get(pkey) or set()
                mk(pkey, dc[pkey], "insert", dead, True)
            for pkey in sorted(set(dp) - set(dc)):
                dead = prev_pairs.get(pkey) or set()
                mk(pkey, dp[pkey], "delete", dead, True)
            for pkey in sorted(set(dp) & set(dc)):
                newly = (cur_pairs.get(pkey) or set()) \
                    - (prev_pairs.get(pkey) or set())
                if newly:
                    mk(pkey, dc[pkey], "delete", newly, False)
                back = (prev_pairs.get(pkey) or set()) \
                    - (cur_pairs.get(pkey) or set())
                if back:
                    mk(pkey, dc[pkey], "insert", back, False)
        if len(parts) > 1:
            from tulflow_spark.ext.iceberg import _plain_path as _pp

            _f.prefetch_parquet_footers(
                [_pp(p.file_path) for p in parts
                 if p.file_format != "ORC"])
        return parts

    def _bindings(self, meta: dict, file_path: str, fmt: str) -> list:
        # the CDF face binds the TABLE columns only — the meta
        # columns are appended in read()
        base_schema = self._schema
        from pyspark.sql.types import StructType as _St

        table_only = _St([f for f in base_schema.fields
                          if f.name not in ("_change_type",
                                            "_commit_seq",
                                            "_snapshot_id")])
        saved = self._schema
        try:
            self._schema = table_only
            return super()._bindings(meta, file_path, fmt)
        finally:
            self._schema = saved

    def read(self, partition: "_IceCdfPartition"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tulflow_spark import fsio
        from tulflow_spark.ext.iceberg import _plain_path

        pos = None if partition.positions is None \
            else set(partition.positions)

        def emit(tbl, offset):
            n = tbl.num_rows
            if pos is not None:
                keep = [i for i in range(n)
                        if ((offset + i) in pos) != partition.exclude]
                if len(keep) != n:
                    tbl = tbl.take(pa.array(keep, pa.int32()))
            m = tbl.num_rows
            if m == 0:
                return
            have = set(tbl.column_names)
            hard = [s[2] for s in partition.columns
                    if s[0] == "file" and s[2] not in have]
            if hard:
                raise DeltaChangeFeedError(
                    f"data file {partition.file_path!r} lacks stream "
                    f"schema columns {hard} — re-sync from a "
                    "snapshot read")
            cols: dict = {}
            for spec in partition.columns:
                if spec[0] == "file":
                    cols[spec[1]] = tbl.column(spec[2])
                else:
                    cols[spec[1]] = pa.nulls(m, type=_pa_type(spec[2]))
            cols["_change_type"] = pa.array(
                [partition.ctype] * m, type=pa.string())
            cols["_commit_seq"] = pa.array(
                [partition.seq] * m, type=pa.int64())
            cols["_snapshot_id"] = pa.array(
                [partition.sid] * m, type=pa.int64())
            yield from pa.table(cols).to_batches()

        fs, lp = fsio.resolve(_plain_path(partition.file_path))
        with fs.open_input_file(lp) as handle:
            if partition.file_format == "ORC":
                import pyarrow.orc as po

                # full-file read: position indexes are global row
                # order, which the single ORC read preserves
                yield from emit(po.read_table(handle), 0)
            else:
                pf = pq.ParquetFile(handle)
                offset = 0
                for batch in pf.iter_batches():
                    tbl = pa.Table.from_batches([batch])
                    yield from emit(tbl, offset)
                    offset += batch.num_rows


class IcebergCdfSource(IcebergChangesSource):
    """``spark.readStream.format("tulflow_iceberg_cdf")`` — the
    streaming CHANGELOG source (appends, whole-file removals,
    position-delete/DV changes, and equality deletes up to
    ``maxEqualityDeleteRows`` planner-resolved rows as typed change
    rows; larger equality-delete debt stays on the batch reader)."""

    @classmethod
    def name(cls) -> str:
        return "tulflow_iceberg_cdf"

    def schema(self):
        from pyspark.sql.types import LongType, StringType, StructField
        from pyspark.sql.types import StructType as _St

        base = super().schema()
        return _St(list(base.fields) + [
            StructField("_change_type", StringType()),
            StructField("_commit_seq", LongType()),
            StructField("_snapshot_id", LongType()),
        ])

    def streamReader(self, schema: StructType):
        return IcebergCdfStreamReader(schema, dict(self.options))
