"""Seeded-random reference tests for the round-6 operators: each compares
the Spark operator against an independent pure-Python implementation over
hundreds of random cases batched into ONE Spark job (the per-example-
session cost of classic property testing doesn't fit Spark; bulk random
with a fixed seed keeps the coverage and the determinism)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_zvalue_n_matches_pure_python_interleave(spark):
    """2/3/4-dim Morton curves over 500 random tuples each vs an
    independent bit-by-bit reference."""
    from tulflow_spark.operators.zorder import zvalue_n

    rng = np.random.default_rng(42)

    def ref(vals, bits):
        out = 0
        n = len(vals)
        for j in range(bits):
            for i, v in enumerate(vals):
                out |= ((int(v) >> j) & 1) << (j * n + i)
        return out

    for n in (2, 3, 4):
        bits = 63 // n if 16 * n > 63 else 16
        hi = min(2**bits, 2**20)
        mat = rng.integers(0, hi, size=(500, n))
        cols = [f"c{i}" for i in range(n)]
        df = spark.createDataFrame(
            [tuple(int(x) for x in row) for row in mat],
            ", ".join(f"{c} long" for c in cols),
        )
        got = [
            r["z"]
            for r in df.select(zvalue_n(cols, bits=bits).alias("z"))
            .collect()
        ]
        expect = [ref(row, bits) for row in mat]
        assert got == expect, f"n={n}"


def test_interval_join_matches_pure_python_containment(spark):
    """400 random points x 60 random intervals (lengths spanning 0 to 15
    buckets), three widths — matches brute-force containment exactly."""
    from tulflow_spark.operators.rangejoin import interval_join

    rng = np.random.default_rng(7)
    pts = [(i, int(rng.integers(0, 300))) for i in range(400)]
    ivs = []
    for j in range(60):
        s = int(rng.integers(-20, 300))
        ln = int(rng.choice([0, 1, 2, 3, 7, 50, 150]))
        ivs.append((j, s, s + ln))
    pdf = spark.createDataFrame(pts, "pid long, t long")
    idf = spark.createDataFrame(ivs, "iid long, s long, e long")
    expect = sorted(
        (pid, iid)
        for pid, t in pts
        for iid, s, e in ivs
        if s <= t < e
    )
    for width in (1, 10, 64):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(pdf, idf, "t", "s", "e", width).collect()
        )
        assert got == expect, f"width={width}"


def test_scd2_batch_random_logs_against_reference(spark):
    """120 random change logs (one per key bucket) in ONE Spark job vs an
    independent fold-left reference with the operator's contract:
    consecutive rows with identical (payload, op) coalesce; D closes the
    open version; versions get [seq, next-kept-seq) intervals."""
    from tulflow_spark.operators.cdc import scd2_history

    rng = np.random.default_rng(3)
    rows = []
    for k in range(120):
        n = int(rng.integers(1, 12))
        for seq in range(n):
            v = f"v{int(rng.integers(0, 3))}"
            op = "D" if rng.random() < 0.2 else ("I" if seq == 0 else "U")
            rows.append((f"k{k}", seq, v, op))

    def ref(evts):
        evts = sorted(evts, key=lambda e: e[1])
        kept = []
        prev_sig = None
        for _, seq, v, op in evts:
            if prev_sig == (v, op):
                continue
            kept.append((seq, v, op))
            prev_sig = (v, op)
        out = []
        for i, (seq, v, op) in enumerate(kept):
            if op == "D":
                continue
            vt = kept[i + 1][0] if i + 1 < len(kept) else None
            out.append((seq, v, vt, vt is None))
        return out

    expect = set()
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    for k, evts in by_key.items():
        for seq, v, vt, cur in ref(evts):
            expect.add((k, seq, v, vt, cur))

    df = spark.createDataFrame(rows, "k string, seq int, v string, op string")
    got = {
        (r["k"], r["valid_from"], r["v"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, ["k"], ["seq"], ["v"], op_col="op")
        .collect()
    }
    assert got == expect


def test_int8_quant_random_against_numpy_reference(spark):
    """Random float matrix: Spark codes equal a numpy reimplementation of
    the affine rule, and reconstruction error obeys the scale/2 bound."""
    from tulflow_spark.ext.quant import fit_minmax, quantize

    rng = np.random.default_rng(11)
    mat = rng.normal(scale=50, size=(300, 6)).astype(np.float32)
    mat[:, 2] = 7.5  # constant dim
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    mins, maxs = fit_minmax(df)
    m64 = mat.astype(np.float64)
    assert mins == pytest.approx(list(m64.min(axis=0)))
    assert maxs == pytest.approx(list(m64.max(axis=0)))

    scale = (np.array(maxs) - np.array(mins)) / 255
    safe = np.where(scale == 0, 1, scale)
    ref_codes = np.where(
        scale == 0, 0, np.floor((m64 - np.array(mins)) / safe + 0.5)
    ).astype(int)
    got = {r["vec_id"]: list(r["q_codes"])
           for r in quantize(df, mins, maxs).collect()}
    for i in range(300):
        assert got[i] == list(ref_codes[i]), i
