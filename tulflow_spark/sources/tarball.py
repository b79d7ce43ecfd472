"""Alma SFTP tarball ingest (reference: process.py:49-63
``expand_alma_sftp_tarball``): each ``.tar.gz`` object must contain exactly
one member — the inner XML; zero or many members is an error.

Spark shape: ``binaryFile`` scan → ``mapInPandas`` doing tarfile expansion.
Errors surface as an ``error`` column (a side-output, not an exception), so
one bad archive can't kill a 100 TB ingest; callers filter/route on it.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TARBALL_SCHEMA = "path string, member string, xml string, error string"


def expand_tarball(raw: bytes) -> tuple[str | None, bytes | None, str | None]:
    """(member_name, content, error) for a single-member .tar.gz
    (member-count validation per the reference)."""
    try:
        with tarfile.open(fileobj=io.BytesIO(raw), mode="r:gz") as tar:
            members = [m for m in tar.getmembers() if m.isfile()]
            if len(members) != 1:
                return None, None, f"expected exactly 1 member, found {len(members)}"
            fh = tar.extractfile(members[0])
            if fh is None:
                return None, None, "unreadable member"
            return members[0].name, fh.read(), None
    except (tarfile.TarError, OSError, EOFError) as exc:
        return None, None, f"bad archive: {exc}"


def read_alma_tarballs(spark: SparkSession, path: str) -> DataFrame:
    """All ``*.tar.gz`` under ``path`` → (path, member, xml, error) rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, file_row in pdf.iterrows():
                member, content, error = expand_tarball(bytes(file_row["content"]))
                rows.append(
                    {
                        "path": file_row["path"],
                        "member": member,
                        "xml": content.decode("utf-8") if content else None,
                        "error": error,
                    }
                )
            yield pd.DataFrame(rows)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar.gz")
        .load(path)
        .select("path", "content")
        .mapInPandas(gen, schema=TARBALL_SCHEMA)
    )
