"""Filesystem access for the custom writers (content-addressed XML sink,
CDC snapshot maintenance).

Spark's own ``df.read``/``df.write`` paths go through the Hadoop FileSystem
API and already speak every scheme the cluster conf knows.  The CUSTOM
writers — ``foreachPartition`` sinks and driver-side snapshot maintenance —
were the only places touching ``os``/``open`` directly, which silently pins
them to executor-local disk.  They now route through ``pyarrow.fs``:

- resolves ``file://``, plain absolute paths, ``s3://``, ``hdfs://``,
  ``gs://`` from the URI alone (no JVM needed, so it works inside
  ``foreachPartition`` on executors where py4j is unavailable);
- one resolved (filesystem, path) pair per call site, reused across a
  partition's chunks.

The reference's equivalents are boto3 point calls (process.py:105-142);
here the same helper serves local tests and object-store deployments.
"""

from __future__ import annotations

import functools as _functools

from pyarrow import fs as pafs


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, fs-internal path) for a URI or absolute local path."""
    return pafs.FileSystem.from_uri(path)


def exists(path: str) -> bool:
    fs, p = resolve(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def is_dir(path: str) -> bool:
    fs, p = resolve(path)
    return fs.get_file_info(p).type == pafs.FileType.Directory


def list_names(path: str) -> list[str]:
    """Immediate child base names of a directory; [] when absent.  (On
    object stores this is a single LIST call, not a recursive walk.)"""
    fs, p = resolve(path)
    if fs.get_file_info(p).type != pafs.FileType.Directory:
        return []
    return [
        i.base_name
        for i in fs.get_file_info(pafs.FileSelector(p, recursive=False))
    ]


def delete(path: str, recursive: bool = False) -> bool:
    """Delete a file or directory tree; False when nothing existed."""
    fs, p = resolve(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.NotFound:
        return False
    if info.type == pafs.FileType.Directory:
        if not recursive:
            raise IsADirectoryError(path)
        fs.delete_dir(p)
    else:
        fs.delete_file(p)
    return True


def write_text(path: str, content: str) -> None:
    """Create parent dirs (no-op on object stores) and write one object."""
    fs, p = resolve(path)
    parent = p.rsplit("/", 1)[0] if "/" in p else ""
    if parent:
        fs.create_dir(parent, recursive=True)
    with fs.open_output_stream(p) as out:
        out.write(content.encode("utf-8"))


def write_text_atomic(path: str, content: str) -> None:
    """Overwrite so that a CONCURRENT reader sees the old content or the
    new content, never a torn/empty object (r16: streaming lake sources
    poll ``version-hint.text`` while DML commits land — a plain
    truncate+write has a window where the hint reads empty).  Local
    filesystems get temp-file + ``os.replace`` (POSIX-atomic rename);
    remote stores already overwrite objects atomically, so the plain
    write is the degradation."""
    fs, p = resolve(path)
    if isinstance(fs, pafs.LocalFileSystem):
        import os
        import uuid

        parent = os.path.dirname(p)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = f"{p}.inflight-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            with open(tmp, "wb") as out:
                out.write(content.encode("utf-8"))
                out.flush()
                os.fsync(out.fileno())
            os.replace(tmp, p)      # atomic overwrite publish
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return
    write_text(path, content)


def write_text_exclusive(path: str, content: str) -> None:
    """Create-if-absent (CAS) write: raise ``FileExistsError`` when the
    object already exists.  Local filesystems publish ATOMICALLY —
    content goes to a temp file first, then ``os.link`` creates the
    target (fails EEXIST, preserving CAS), so a crash mid-write leaves
    only temp debris, never a half-written commit point that wedges a
    log's forward scan.  Remote filesystems degrade to
    check-then-write (a narrow TOCTOU window — the same best-effort
    stores without put-if-absent force on every lake format)."""
    fs, p = resolve(path)
    if isinstance(fs, pafs.LocalFileSystem):
        import os
        import uuid

        parent = os.path.dirname(p)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = f"{p}.inflight-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            with os.fdopen(fd, "wb") as out:
                out.write(content.encode("utf-8"))
                out.flush()
                os.fsync(out.fileno())
            try:
                os.link(tmp, p)     # atomic create-if-absent publish
            except FileExistsError:
                raise FileExistsError(p) from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return
    if exists(path):
        raise FileExistsError(path)
    write_text(path, content)


def parquet_footer_fields(path: str) -> tuple[tuple[str, ...],
                                              tuple[tuple[int, str], ...]]:
    """One parquet file's footer column names and its
    ``PARQUET:field_id`` → name pairs — the shared field-id probe for
    the Iceberg reader and Delta column-mapping mode=id (one
    implementation so the two lake readers can never diverge).

    Cached by (path, size, mtime): committed data files are immutable
    in both lake formats, so re-reads of a table never re-open footers
    they have seen, while an in-place rewrite (fixtures, tests) still
    invalidates.  Raises ``ValueError`` on an unreadable file or a
    duplicated field id (ambiguous) — callers re-wrap typed."""
    fs, lp = resolve(path)
    try:
        info = fs.get_file_info(lp)
    except OSError as exc:
        raise ValueError(
            f"cannot stat data file {lp!r}: {exc}") from None
    if info.type != pafs.FileType.File:
        raise ValueError(f"cannot open data file {lp!r}: not a file")
    mt = info.mtime_ns if info.mtime_ns is not None else info.mtime
    return _footer_fields_cached(path, int(info.size or 0), mt)


@_functools.lru_cache(maxsize=65536)
def _footer_schema_cached(path: str, size: int, mtime):
    """The file's Arrow schema, cached under the same immutability key
    as :func:`_footer_fields_cached` (committed lake data files never
    change in place; fixtures that rewrite bump size/mtime)."""
    import pyarrow.parquet as pq

    fs, lp = resolve(path)
    try:
        with fs.open_input_file(lp) as handle:
            return pq.ParquetFile(handle).schema_arrow
    except OSError as exc:
        raise ValueError(f"cannot open data file {lp!r}: {exc}") from None


def parquet_arrow_schema(path: str):
    """One parquet file's Arrow schema via the immutability-keyed footer
    cache — the driver-side peek that lets reads pass an EXPLICIT schema
    to ``spark.read`` instead of paying JVM-side footer inference per
    call (guide §5: the driver should do almost no data work — ~100 ms
    of DataSource schema resolution per read adds up across a
    metadata-heavy DML commit's dozens of scans)."""
    fs, lp = resolve(path)
    try:
        info = fs.get_file_info(lp)
    except OSError as exc:
        raise ValueError(
            f"cannot stat data file {lp!r}: {exc}") from None
    if info.type != pafs.FileType.File:
        raise ValueError(f"cannot open data file {lp!r}: not a file")
    mt = info.mtime_ns if info.mtime_ns is not None else info.mtime
    return _footer_schema_cached(path, int(info.size or 0), mt)


def spark_schema_for_parquet(path: str):
    """Spark ``StructType`` matching what Spark itself would infer for
    ``path`` (TIMESTAMP_NTZ for tz-naive stamps, per the 3.4+
    ``inferTimestampNTZ`` default) — or ``None`` when the file carries a
    type whose inference this helper cannot prove it reproduces
    (timestamp[ns] under ``nanosAsLong``, unsigned ints, views).
    Callers fall back to plain inference on ``None``; passing the
    result to ``spark.read.schema(...)`` skips the per-call JVM footer
    job entirely.  A directory path resolves through its first
    ``*.parquet`` member — the same single-footer peek Spark's own
    mergeSchema=false inference performs."""
    try:
        fs, lp = resolve(path)
        info = fs.get_file_info(lp)
        if info.type == pafs.FileType.Directory:
            members = sorted(
                n for n in list_names(path)
                if n.endswith(".parquet") and not n.startswith(("_", ".")))
            if not members:
                return None
            path = f"{path.rstrip('/')}/{members[0]}"
        sc = parquet_arrow_schema(path)
    except (ValueError, OSError):
        return None
    for f in sc:
        t = str(f.type)
        # ns timestamps flip on spark.sql.legacy.parquet.nanosAsLong
        # (reads as BIGINT); uint/view types coerce non-obviously —
        # proof-or-no-shortcut, same discipline as bounds pruning
        if t.startswith("timestamp[ns") or t.startswith("uint") \
                or "view" in t:
            return None
    try:
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(sc, prefer_timestamp_ntz=True)
    except Exception:
        return None


@_functools.lru_cache(maxsize=65536)
def _footer_fields_cached(path: str, size: int, mtime) -> tuple:
    sc = _footer_schema_cached(path, size, mtime)
    lp = path
    ids: dict[int, str] = {}
    for f in sc:
        raw = (f.metadata or {}).get(b"PARQUET:field_id")
        if raw is None:
            continue
        try:
            fid = int(raw)
        except ValueError:
            continue
        if fid in ids:
            raise ValueError(
                f"data file {lp!r} carries field id {fid} twice "
                f"({ids[fid]!r} and {f.name!r}) — ambiguous")
        ids[fid] = f.name
    return tuple(sc.names), tuple(sorted(ids.items()))


def prefetch_parquet_footers(paths: list[str]) -> None:
    """Warm :func:`parquet_footer_fields` for many files concurrently —
    planning over thousands of live files would otherwise pay one
    SERIAL footer open per file on the driver (painful on object
    stores).  Errors surface on the caller's own per-file call."""
    from concurrent.futures import ThreadPoolExecutor

    todo = list(dict.fromkeys(paths))
    if len(todo) < 2:
        return

    def warm(p: str) -> None:
        try:
            parquet_footer_fields(p)
        except ValueError:
            pass    # re-raised typed by the caller's sequential pass

    with ThreadPoolExecutor(max_workers=min(16, len(todo))) as ex:
        list(ex.map(warm, todo))
