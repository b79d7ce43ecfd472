"""As-of (time-travel) join: for every left row, the newest right row with
``right.ts <= left.ts`` on the same key — the canonical point-in-time
enrichment (trades→quotes, events→latest-config, clicks→last-view).

Spark has no native ASOF JOIN (DuckDB/Pandas do).  A range join
(``l.ts >= r.ts``) explodes to O(|L|·|R|) per key before aggregation, so
this operator uses the union-tag trick instead:

1. tag right rows 0 and left rows 1, union them with ONE struct column
   holding the whole right payload (null struct on left rows);
2. one window per key ordered by ``(ts, tag)`` carries the last non-null
   struct forward (``last(..., ignorenulls=True)``) — at equal timestamps
   the right row sorts first, giving the inclusive ``>=`` match.  The
   struct makes the carry atomic: a matching right row whose payload
   value is legitimately NULL carries that NULL, instead of each column
   independently falling back to an older row's value;
3. keep only left rows and unpack the struct.

Scale: ONE shuffle on the key columns (the window partition) and a
per-key sort — same cost as the group-by any range-join rewrite would
need, with no intermediate pair blow-up.  Hot keys are bounded by the
per-key row count, not its square; AQE skew handling applies to the
window exchange.  ``tolerance`` bounds the look-back without a second
pass (the match is nulled out in the same projection).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    prefix: str = "asof_",
    tolerance: _dt.timedelta | None = None,
) -> DataFrame:
    """Left as-of join (backward, inclusive).

    Every ``left`` row gains ``{prefix}{right_ts}`` and ``{prefix}{col}``
    for each payload column, taken from the newest ``right`` row with the
    same ``on`` key and ``right.{right_ts} <= left.{left_ts}`` (within
    ``tolerance``, if given); null when no such row exists.

    ``right`` must be unique per ``(on, right_ts)`` — pre-aggregate
    otherwise, or the carried payload is an arbitrary member of the tie.
    """
    from pyspark.sql.types import StructField, StructType

    ts = "_asof_ts"
    tag = "_asof_tag"
    pay = "_asof_payload"
    pcols = [f"{prefix}{c}" for c in payload]
    ptscol = f"{prefix}{right_ts}"

    # One struct per right row — carried atomically so a NULL payload value
    # in the matching right row stays NULL (never replaced by an older
    # row's value, which would mix rows and diverge from ASOF semantics).
    pay_type = StructType(
        [StructField(ptscol, right.schema[right_ts].dataType)]
        + [
            StructField(p, right.schema[c].dataType)
            for c, p in zip(payload, pcols)
        ]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(tag),
        F.struct(
            F.col(right_ts).alias(ptscol),
            *[F.col(c).alias(p) for c, p in zip(payload, pcols)],
        ).alias(pay),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(ts),
        F.lit(1).alias(tag),
        F.lit(None).cast(pay_type).alias(pay),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(ts, tag)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        tag,
        ts,
        *[f"_l_{c}" for c in left.columns],
        F.last(pay, ignorenulls=True).over(w).alias(pay),
    )

    out = carried.filter(F.col(tag) == 1)
    if tolerance is not None:
        # F.lit(timedelta) → DayTimeIntervalType with full microsecond
        # precision; interpolating total_seconds() into an INTERVAL literal
        # breaks on sub-millisecond values (scientific notation, e.g.
        # '1e-06', is rejected by the interval parser at analysis time).
        in_range = F.col(pay)[ptscol] >= F.col(ts) - F.lit(tolerance)
        out = out.withColumn(pay, F.when(in_range, F.col(pay)))
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(pay)[c].alias(c) for c in [ptscol, *pcols]],
    )
