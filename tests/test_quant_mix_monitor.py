"""ext.quant (int8 scalar quantization), ext.mixing.temperature_mix,
ext.monitor.psi_table — behavior beyond the oracle-parity registry pairs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


class TestQuant:
    def test_exact_on_grid_and_error_bound(self, spark):
        from tulflow_spark.ext.quant import fit_minmax, quantize

        # dim0 spans [0, 255] on integer grid -> codes exact, err 0;
        # dim1 constant -> scale 0 -> code 0, err 0; dim2 arbitrary
        rows = [
            (i, [float(i % 256), 7.0, float(i) * 0.137]) for i in range(300)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        mins, maxs = fit_minmax(df)
        assert mins[1] == maxs[1] == 7.0
        out = quantize(df, mins, maxs).collect()
        scale2 = (maxs[2] - mins[2]) / 255
        for r in out:
            codes = list(r["q_codes"])
            assert codes[0] == r["vec_id"] % 256
            assert codes[1] == 0
            assert 0 <= codes[2] <= 255
            # affine rounding bound: err <= scale/2 (+ float slack)
            assert r["max_abs_err"] <= scale2 / 2 + 1e-9

    def test_codes_engine_deterministic_under_repartition(self, spark):
        from tulflow_spark.ext.quant import fit_minmax, quantize

        rows = [(i, [math.sin(i), math.cos(i)]) for i in range(64)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        mins, maxs = fit_minmax(df)
        a = {r["vec_id"]: list(r["q_codes"])
             for r in quantize(df, mins, maxs).collect()}
        b = {r["vec_id"]: list(r["q_codes"])
             for r in quantize(df.repartition(5), mins, maxs).collect()}
        assert a == b


class TestTemperatureMix:
    def _docs(self, spark):
        # skewed corpus: big domain 90 docs, small domain 10; 10 tokens each
        rows = [(i, "big" if i < 90 else "small", 10) for i in range(100)]
        return spark.createDataFrame(
            rows, "doc_id long, source string, n_tok int"
        )

    def test_temperature_flattens_skew(self, spark):
        from tulflow_spark.ext.mixing import temperature_rates

        docs = self._docs(spark)
        rates = temperature_rates(docs, "source", "n_tok", budget_tokens=300)
        # T=2: weights ∝ sqrt(n); small domain's PER-DOC rate must exceed
        # the big domain's by ~sqrt(90/10) = 3x (flattening), while the
        # natural (T=1) split would keep them equal
        assert rates["small"] > rates["big"] * 2.5
        # budget is respected in expectation: sum(rate_d * tokens_d) ~ 300
        expect = rates["big"] * 900 + rates["small"] * 100
        assert expect == pytest.approx(300, rel=0.01)

    def test_rates_cap_at_one_and_nested_samples(self, spark):
        from tulflow_spark.ext.mixing import temperature_mix, temperature_rates

        docs = self._docs(spark)
        rates = temperature_rates(docs, "source", "n_tok", budget_tokens=10**6)
        assert rates == {"big": 1.0, "small": 1.0}
        lo = {r["doc_id"] for r in temperature_mix(
            docs, "doc_id", "source", "n_tok", 300).collect()}
        hi = {r["doc_id"] for r in temperature_mix(
            docs, "doc_id", "source", "n_tok", 600).collect()}
        assert lo <= hi  # hash thresholds nest

    def test_bad_temperature_rejected(self, spark):
        from tulflow_spark.ext.mixing import temperature_rates

        with pytest.raises(ValueError, match="temperature"):
            temperature_rates(self._docs(spark), "source", "n_tok", 1.0, 0.0)


class TestPsi:
    def test_identical_halves_near_zero(self, spark):
        from tulflow_spark.ext.monitor import psi_table

        rows = [(i % 2, i % 7) for i in range(700)]
        df = spark.createDataFrame(rows, "split int, bucket int")
        terms = psi_table(df, "split", "bucket", n_buckets=7).collect()
        psi = sum(r["term"] for r in terms)
        assert abs(psi) < 1e-6

    def test_shifted_distribution_raises_psi(self, spark):
        from tulflow_spark.ext.monitor import psi_table

        rows = [(0, i % 4) for i in range(400)] + [
            (1, (i % 4) + 4) for i in range(400)
        ]
        df = spark.createDataFrame(rows, "split int, bucket int")
        terms = psi_table(df, "split", "bucket", n_buckets=8).collect()
        psi = sum(r["term"] for r in terms)
        assert psi > 0.25  # disjoint supports = severe drift

    def test_empty_buckets_in_spine_with_laplace(self, spark):
        from tulflow_spark.ext.monitor import psi_table

        rows = [(0, 0)] * 5 + [(1, 1)] * 5
        df = spark.createDataFrame(rows, "split int, bucket int")
        got = psi_table(df, "split", "bucket", n_buckets=4).collect()
        assert len(got) == 4  # full spine, including never-seen buckets
        assert all(r["term"] is not None for r in got)
