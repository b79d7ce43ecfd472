"""Local mirror of the driver's Spark-vs-DuckDB comparison: sort columns by
name, canonicalize values, sort rows, require exact equality.  Stricter than
any plausible hash, so passing here should imply passing the gate."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import pandas as pd


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, (int,)):
        return str(int(v))
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.floating):
            return _canon(float(v))
        if isinstance(v, np.bool_):
            return str(bool(v))
    except ImportError:
        pass
    return str(v)


def normalize(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(_canon(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    # dtype parity (timestamp resolution normalized): int32-vs-int64 drift
    # between engines is a schema mismatch at the driver's gate
    for col in spark_pdf.columns:
        sd = str(spark_pdf[col].dtype).replace("[us]", "[ns]")
        od = str(oracle_pdf[col].dtype).replace("[us]", "[ns]")
        assert sd == od, f"{name}.{col}: dtype spark={sd} oracle={od}"
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    assert len(s) == len(o), f"{name}: row count spark={len(s)} oracle={len(o)}"
    diffs = [(a, b) for a, b in zip(s, o) if a != b]
    assert not diffs, f"{name}: {len(diffs)} differing rows; first: {diffs[0]}"
