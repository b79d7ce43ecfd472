"""Custom per-record parser hook — the reference's ``parser`` kwarg surface
(harvest.py:172,194-195): an arbitrary user function applied to each record's
payload during harvest.

The reference calls ``parser(lxml.Element) -> lxml.Element`` inline in its
single thread.  Here the same contract — a plain Python
``Element -> Element | None`` function — is lifted into an Arrow-batched
``mapInPandas`` stage: one parse/serialize round-trip per record, the hook
itself untouched, executors each run thousands of records per batch.
Returning ``None`` drops the record (the hook doubles as a filter).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

ElementHook = Callable[[ET.Element], "ET.Element | None"]


def apply_record_parser(
    df: DataFrame,
    hook: ElementHook,
    xml_col: str = "metadata_xml",
) -> DataFrame:
    """Apply an Element→Element hook to each record's payload XML.

    The hook must be picklable (module-level function or importable
    callable).  NULL payloads pass through untouched, mirroring the
    reference's skip of metadata-less records.
    """
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                payload = row[xml_col]
                if payload is not None:
                    result = hook(ET.fromstring(payload))
                    if result is None:
                        continue  # hook dropped the record
                    row = row.copy()
                    row[xml_col] = ET.tostring(result, encoding="unicode")
                out_rows.append(row)
            if out_rows:
                yield pd.DataFrame(out_rows)

    return df.mapInPandas(gen, schema=schema)
