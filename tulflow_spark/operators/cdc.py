"""CDC / upsert semantics for deleted-record streams.

The reference marks deletions with ``status="deleted"`` headers and routes
them to a separate output prefix (harvest.py:196-203); the downstream index
applies them as deletes.  This operator is the engine-native form: collapse
a keyed change stream to its latest snapshot, dropping keys whose newest
version is a delete — MERGE semantics without a mutable sink.

Scale: one shuffle on the key (window partition), AQE-skew-aware; in
streaming the same semantics come from ``stream_dedupe`` + deleted-flag
filtering at the sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    deleted: Column | str = "deleted",
) -> DataFrame:
    """Latest row per key (by ``order_by``, ties broken by the full list),
    with keys whose latest version is deleted removed entirely."""
    cond = F.col(deleted) if isinstance(deleted, str) else deleted
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(~cond)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Batch MERGE INTO semantics without a mutable sink: apply a keyed
    change set (``op`` ∈ I/U/D) to a base table and return the merged
    relation.

    - D: key disappears;
    - U: the change row replaces the base row (full-row replace);
    - I: the change row appears (insert-only keys must not exist in base —
      enforced upstream; here I and U behave identically, matching the
      WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT pair).

    Shape: one left-anti join of base against the change keys (shuffles
    keys only, or broadcasts when the change set is dimension-sized — the
    common CDC case) + a union with the non-delete change rows.  No window,
    no full-table rewrite — this is the plan a MERGE would compile to when
    the target has no sort/cluster requirement.
    """
    cols = base.columns
    chg_keys = changes.select(*keys)
    if broadcast_changes:
        chg_keys = F.broadcast(chg_keys)
    # broadcast_changes=False for change sets too large to broadcast
    # (rare in CDC; the anti-join then shuffles keys on both sides)
    kept = base.join(chg_keys, keys, "left_anti")
    applied = changes.filter(F.col(op_col) != "D").select(*cols)
    return kept.unionByName(applied)


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    payload: list[str],
    op_col: str | None = None,
    drop_noop: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history from a keyed change log:
    one row per version with its validity interval — the
    dimension-history pattern a lakehouse MERGE maintains incrementally,
    derived here in one pass over the full log.

    Output = key + payload + ``valid_from`` (the first ``order_by``
    column), ``valid_to`` (the next version's valid_from; NULL while
    open) and ``is_current``.  With ``op_col`` (values I/U/D), a D row
    CLOSES the previous version's interval without opening one.  With
    ``drop_noop``, an update carrying an identical payload (and op) to
    its predecessor is removed first, so versions always represent real
    changes and their intervals coalesce.

    Scale: both windows partition on the key — ONE hash exchange (the
    second window reuses the first's partitioning/sort), per-key cost
    linear in versions; AQE skew handling applies to the exchange.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    sig_cols = payload + ([op_col] if op_col else [])
    out = changes
    if drop_noop:
        same_as_prev = F.lit(True)
        for c in sig_cols:
            same_as_prev = same_as_prev & F.lag(c).over(w).eqNullSafe(
                F.col(c)
            )
        # first row per key has lag NULL on every column: eqNullSafe is
        # only True when the value is also NULL, so guard explicitly
        is_first = F.row_number().over(w) == 1
        out = (
            out.withColumn("_noop", ~is_first & same_as_prev)
            .filter(~F.col("_noop"))
            .drop("_noop")
        )
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    vf = F.col(order_by[0])
    vt = F.lead(order_by[0]).over(w2)
    out = out.select(
        *keys,
        *payload,
        vf.alias("valid_from"),
        vt.alias("valid_to"),
        (vt.isNull()
         & (F.col(op_col) != "D" if op_col else F.lit(True))
         ).alias("is_current"),
        *([op_col] if op_col else []),
    )
    if op_col:
        out = out.filter(F.col(op_col) != "D").drop(op_col)
    return out
