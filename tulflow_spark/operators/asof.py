"""As-of (time-travel) join: for every left row, the newest right row with
``right.ts <= left.ts`` on the same key — the canonical point-in-time
enrichment (trades→quotes, events→latest-config, clicks→last-view).

Spark has no native ASOF JOIN (DuckDB/Pandas do).  A range join
(``l.ts >= r.ts``) explodes to O(|L|·|R|) per key before aggregation, so
this operator uses the union-tag trick instead:

1. tag right rows 0 and left rows 1, union them with the right payload
   columns nulled on left rows;
2. one window per key ordered by ``(ts, tag)`` carries the last non-null
   payload forward (``last(..., ignorenulls=True)``) — at equal timestamps
   the right row sorts first, giving the inclusive ``>=`` match;
3. keep only left rows.

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
    ts = "_asof_ts"
    tag = "_asof_tag"
    pcols = [f"{prefix}{c}" for c in payload]
    ptscol = f"{prefix}{right_ts}"

    r = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(tag),
        F.col(right_ts).alias(ptscol),
        *[F.col(c).alias(p) for c, p in zip(payload, pcols)],
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(ts),
        F.lit(1).alias(tag),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(ptscol),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(p)
            for c, p in zip(payload, pcols)
        ],
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
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in [ptscol, *pcols]],
    )

    out = carried.filter(F.col(tag) == 1)
    if tolerance is not None:
        secs = tolerance.total_seconds()
        in_range = F.col(ptscol) >= F.col(ts) - F.expr(
            f"INTERVAL {secs} SECOND"
        )
        out = out.select(
            tag,
            ts,
            *[f"_l_{c}" for c in left.columns],
            *[
                F.when(in_range, F.col(c)).alias(c)
                for c in [ptscol, *pcols]
            ],
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        ptscol,
        *pcols,
    )
