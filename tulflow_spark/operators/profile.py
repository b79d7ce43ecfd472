"""Table profiling: per-column statistics in ONE pass over the data.

The engine-side feature behind "ANALYZE TABLE" / data-quality dashboards:
null counts, distinct counts, min/max per column, computed as a single
wide aggregate (one scan, one map-side-combinable reduction) and then
unpivoted to one row per column — never one job per column.

At 100 TB you would flip ``exact_distinct=False`` to use HLL
(``approx_count_distinct``) — distinct-count state is then bounded per
column instead of proportional to cardinality; the exact variant exists
so the operator is oracle-checkable bit-for-bit (the HLL path's accuracy
is the a7 gate's subject).  Numeric min/max surface as DOUBLE and
everything else as its cast-to-string form, so one fixed output schema
covers any profiled column set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

OUT_COLS = ["column", "n_nulls", "n_distinct", "min_num", "max_num",
            "min_str", "max_str"]


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """→ one row per profiled column: (column, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str)."""
    cols = columns or df.columns
    types = dict(df.dtypes)
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in cols:
        numeric = isinstance(fields[c], NumericType)
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        aggs.append(
            (F.count_distinct(F.col(c)) if exact_distinct
             else F.approx_count_distinct(F.col(c))).alias(f"{c}__distinct")
        )
        if numeric:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max_num"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"{c}__min_str"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"{c}__max_str"))
    wide = df.agg(*aggs)

    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (
                    F.col(f"{c}__min_num")
                    if isinstance(fields[c], NumericType)
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"{c}__max_num")
                    if isinstance(fields[c], NumericType)
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.lit(None).cast("string")
                    if isinstance(fields[c], NumericType)
                    else F.col(f"{c}__min_str")
                ).alias("min_str"),
                (
                    F.lit(None).cast("string")
                    if isinstance(fields[c], NumericType)
                    else F.col(f"{c}__max_str")
                ).alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        *[F.col(f"r.{c}").alias(c) for c in OUT_COLS]
    )


def profile_sql(table: str, columns: list[tuple[str, bool]]) -> str:
    """DuckDB mirror: ``columns`` is [(name, is_numeric)]."""
    selects = []
    for c, numeric in columns:
        if numeric:
            mn = f"CAST(MIN({c}) AS DOUBLE)"
            mx = f"CAST(MAX({c}) AS DOUBLE)"
            ms = me = "CAST(NULL AS VARCHAR)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            ms = f"MIN(CAST({c} AS VARCHAR))"
            me = f"MAX(CAST({c} AS VARCHAR))"
        selects.append(
            f"SELECT '{c}' AS column, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, "
            f"{ms} AS min_str, {me} AS max_str FROM {table}"
        )
    return " UNION ALL ".join(selects)
