"""Z-order clustering: Morton-curve exactness (vs a pure-Python reference
interleave) and the locality property that makes the layout prunable —
z-ordered range partitions cover far smaller per-dimension bounding boxes
than single-key-sorted partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tulflow_spark.operators.zorder import zorder_layout, zvalue


def ref_morton(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 1023, 65535) for y in (0, 2, 7, 512, 65535)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue("x", "y").alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == ref_morton(x, y), (x, y)


def test_zorder_partitions_have_tight_boxes(spark):
    """Partition a 64×64 grid into 16 ranges by z-value vs by x alone.
    Z-ranges must bound BOTH dimensions (each covers ≤ a quadrant-ish
    box), while x-sorted ranges span the full y extent — the measurable
    reason a z-ordered layout prunes on either predicate."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("bigint").alias("y")
    )
    z = grid.select("x", "y", zvalue("x", "y").alias("z"))
    # 16 equal z-ranges of the 12-bit z-space (64x64 → z < 4096)
    zr = (
        z.withColumn("bucket", F.shiftright("z", 8))
        .groupBy("bucket")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(zr) == 16
    for r in zr:
        assert r.dx <= 15 and r.dy <= 15  # every z-range is a 16×16 tile
    # x-sorted baseline: same partition count, y never bounded
    xr = (
        grid.withColumn("bucket", F.shiftright("x", 2))
        .groupBy("bucket")
        .agg((F.max("y") - F.min("y")).alias("dy"))
        .collect()
    )
    assert all(r.dy == 63 for r in xr)


def test_zorder_layout_buckets_bound_both_dims(spark, sf_dir):
    from tulflow_spark.io import table

    out = zorder_layout(
        table(spark, sf_dir, "lineitem"), "l_partkey", "l_suppkey",
        n_buckets_shift=8,
    ).collect()
    assert len(out) >= 2
    full_x = max(r.max_x for r in out) - min(r.min_x for r in out)
    # every bucket's x-extent is a proper fraction of the global extent
    assert all((r.max_x - r.min_x) <= full_x for r in out)


def test_write_zordered_footer_stats_prune_both_dims(spark, tmp_path):
    """The payoff test: after write_zordered, the real parquet footers
    bound BOTH dimensions per file, and a rectangle predicate would prune
    most files on either column — against an x-sorted layout where y
    stats never prune anything."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from tulflow_spark.operators.zorder import write_zordered

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y"),
    )
    zdir = tmp_path / "zorder"
    write_zordered(grid, str(zdir), "x", "y", n_files=16)

    def file_boxes(d):
        boxes = []
        for f in Path(d).glob("*.parquet"):
            md = pq.ParquetFile(f).metadata
            xs, ys = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    (xs if name == "x" else ys).append((st.min, st.max))
            boxes.append(
                (
                    min(a for a, _ in xs), max(b for _, b in xs),
                    min(a for a, _ in ys), max(b for _, b in ys),
                )
            )
        return boxes

    boxes = file_boxes(zdir)
    assert len(boxes) == 16
    # a query for x in [0,15] AND y in [0,15] must prune >= half the files
    hit = [
        b for b in boxes
        if not (b[1] < 0 or b[0] > 15) and not (b[3] < 0 or b[2] > 15)
    ]
    assert len(hit) <= len(boxes) // 2
    # and EVERY file bounds y as well as x (two-dimensional locality)
    for x0, x1, y0, y1 in boxes:
        assert (x1 - x0) <= 32 and (y1 - y0) <= 32

    # baseline: x-sorted layout never bounds y
    xdir = tmp_path / "xsorted"
    grid.repartitionByRange(16, "x").sortWithinPartitions("x")\
        .write.parquet(str(xdir))
    xboxes = file_boxes(xdir)
    assert all((y1 - y0) == 63 for _, _, y0, y1 in xboxes)


def test_write_zordered_rejects_overflowing_keys(spark, tmp_path):
    """Explicit bits + keys >= 2**bits must raise, not silently alias
    distant values into the same z-range (r5 ADVICE)."""
    import pytest

    from tulflow_spark.operators.zorder import write_zordered

    df = spark.range(70000).selectExpr("id AS x", "id % 100 AS y")
    with pytest.raises(ValueError, match="alias"):
        write_zordered(df, str(tmp_path / "z"), "x", "y", n_files=4, bits=16)
    # bits=None derives resolution from the data and succeeds
    write_zordered(df, str(tmp_path / "z2"), "x", "y", n_files=4)
    assert spark.read.parquet(str(tmp_path / "z2")).count() == 70000


def test_zvalue_n_matches_zvalue_for_two_dims(spark):
    from tulflow_spark.operators.zorder import zvalue, zvalue_n

    df = spark.range(64).selectExpr("id AS x", "id * 7 % 64 AS y")
    got = df.select(
        (zvalue("x", "y") == zvalue_n(["x", "y"])).alias("eq")
    ).collect()
    assert all(r["eq"] for r in got)


def test_zvalue_n_three_dims_hand_computed(spark):
    """(x,y,w)=(1,0,0)->bit0 ; (0,1,0)->bit1 ; (0,0,1)->bit2 ;
    (2,3,1) -> x bit1 -> pos 3 (8), y bits {0,1} -> pos 1,4 (2+16),
    w bit0 -> pos 2 (4): z = 8+2+16+4 = 30."""
    from tulflow_spark.operators.zorder import zvalue_n

    df = spark.createDataFrame(
        [(1, 0, 0), (0, 1, 0), (0, 0, 1), (2, 3, 1)],
        "x int, y int, w int",
    )
    got = [r[0] for r in df.select(zvalue_n(["x", "y", "w"])).collect()]
    assert got == [1, 2, 4, 30]


def test_zvalue_n_validates(spark):
    import pytest

    from tulflow_spark.operators.zorder import zvalue_n

    with pytest.raises(ValueError, match=">= 2"):
        zvalue_n(["x"])
    with pytest.raises(ValueError, match="63"):
        zvalue_n(["a", "b", "c", "d"], bits=16)


def test_write_zordered_default_path_single_pass_and_guarded(spark, tmp_path):
    """r6 VERDICT perf item: the default (bits=None) write must NOT run a
    data-max pre-scan job before the write — the overflow guard rides the
    z expression instead — and a key outside [0, 2**31) still fails the
    write loudly."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from tulflow_spark.operators.zorder import write_zordered

    df = spark.range(10000).selectExpr("id AS x", "id % 64 AS y")
    # structural pin: the pre-scan was df.agg(max, max) — the default
    # path must never call .agg on the input frame
    with mock.patch.object(
        DataFrame, "agg",
        side_effect=AssertionError("default write ran a pre-scan agg"),
    ):
        write_zordered(df, str(tmp_path / "z1"), "x", "y", n_files=4)
    assert spark.read.parquet(str(tmp_path / "z1")).count() == 10000

    # overflow fails the write loudly (in-expression raise_error)
    bad = spark.createDataFrame(
        [(1 << 32, 5)], "x long, y long"
    )
    import pytest

    with pytest.raises(Exception, match="z-curve budget"):
        write_zordered(bad, str(tmp_path / "z2"), "x", "y", n_files=1)
    neg = spark.createDataFrame([(-3, 5)], "x long, y long")
    with pytest.raises(Exception, match="z-curve budget"):
        write_zordered(neg, str(tmp_path / "z3"), "x", "y", n_files=1)


def test_write_zordered_explicit_bits_rejects_negative_keys(spark, tmp_path):
    """Review finding r7 (medium pass): shiftright sign-extends negative
    keys into an all-ones interleave — the explicit-bits validation
    pre-scan must reject them like the default path's guard does."""
    import pytest

    from tulflow_spark.operators.zorder import write_zordered

    df = spark.createDataFrame([(-3, 5), (10, 6)], "x long, y long")
    with pytest.raises(ValueError, match="negative"):
        write_zordered(df, str(tmp_path / "zn"), "x", "y", n_files=2,
                       bits=16)
