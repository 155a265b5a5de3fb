"""ARIMA tests: differencing algebra, AR/MA coefficient recovery on
synthetic series, forecast sanity, Spark fan-out parity with local fit."""

from __future__ import annotations

import numpy as np
import pytest

from tuktu_spark.ml.timeseries import (
    arima_fit,
    arima_forecast,
    arima_forecast_series,
    differences,
    inv_differences,
)


def gen_arma(phi, theta, c, n, seed):
    """Simulate ARMA(p, q) with unit-variance gaussian innovations."""
    rng = np.random.RandomState(seed)
    p, q = len(phi), len(theta)
    e = rng.normal(0, 1.0, n + 100)
    x = np.zeros(n + 100)
    for t in range(max(p, q), n + 100):
        x[t] = c + sum(phi[j] * x[t - j - 1] for j in range(p)) + e[t] + sum(
            theta[j] * e[t - j - 1] for j in range(q)
        )
    return x[100:]


class TestDifferencing:
    def test_round_trip(self):
        x = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0])
        for d in (0, 1, 2, 3):
            np.testing.assert_allclose(
                inv_differences(differences(x, d), d), x, rtol=1e-12
            )

    def test_first_elements_preserved(self):
        x = np.arange(10, dtype="float64")
        d2 = differences(x, 2)
        assert list(d2[:2]) == [0.0, 1.0]  # copied unchanged
        np.testing.assert_allclose(d2[2:], 2.0)


class TestFit:
    def test_pure_ar_recovery(self):
        x = gen_arma([0.6, -0.2], [], 1.0, 3000, seed=1)
        coeffs = arima_fit(x, p=2, d=0, q=0)
        assert coeffs[1] == pytest.approx(0.6, abs=0.06)
        assert coeffs[2] == pytest.approx(-0.2, abs=0.06)

    def test_arma11_recovery(self):
        x = gen_arma([0.5], [0.4], 0.0, 4000, seed=2)
        coeffs = arima_fit(x, p=1, d=0, q=1)
        # CSS on 4k points: phi and theta within loose tolerance
        assert coeffs[1] == pytest.approx(0.5, abs=0.1)
        assert coeffs[2] == pytest.approx(0.4, abs=0.15)

    def test_arima_with_differencing_recovers_trend(self):
        # random walk with AR(1) increments: d=1 should whiten it
        inc = gen_arma([0.5], [], 0.2, 2000, seed=3)
        x = np.cumsum(inc)
        coeffs = arima_fit(x, p=1, d=1, q=0)
        assert coeffs[1] == pytest.approx(0.5, abs=0.08)


class TestForecast:
    def test_constant_series_forecast_is_constant(self):
        x = np.full(50, 7.0)
        coeffs = arima_fit(x + np.random.RandomState(4).normal(0, 1e-9, 50), 1, 0, 0)
        out = arima_forecast_series(x, coeffs, 1, 0, 0, n_future=3)
        assert len(out) == 53
        np.testing.assert_allclose(out[-3:], 7.0, atol=0.1)

    def test_linear_trend_with_d1(self):
        # exact line: after d=1 the diffs are constant -> forecast continues it
        x = np.arange(40, dtype="float64") * 2.0 + 5.0
        coeffs = arima_fit(x + np.random.RandomState(5).normal(0, 1e-6, 40), 1, 1, 0)
        out = arima_forecast_series(x, coeffs, 1, 1, 0, n_future=4)
        np.testing.assert_allclose(out[-4:], [85.0, 87.0, 89.0, 91.0], atol=0.5)

    def test_forecast_historical_section_is_one_step_ahead(self):
        x = gen_arma([0.7], [], 0.0, 120, seed=6)
        coeffs = arima_fit(x, 1, 0, 0)
        out = arima_forecast_series(x, coeffs, 1, 0, 0, n_future=2)
        # 1-step-ahead fits should correlate strongly with the series
        fit_sec = out[1:120]
        corr = np.corrcoef(fit_sec, x[1:])[0, 1]
        assert corr > 0.5


class TestSparkArima:
    def test_spark_matches_local_per_series(self, spark):
        series = {
            "a": gen_arma([0.5], [0.3], 0.1, 200, seed=10),
            "b": gen_arma([0.3], [0.2], 0.0, 200, seed=11),
        }
        rows = [
            (k, t, float(v)) for k, xs in series.items() for t, v in enumerate(xs)
        ]
        sdf = spark.createDataFrame(rows, "k string, t int, v double")
        out = arima_forecast(sdf, ["k"], "t", "v", p=1, d=0, q=1, horizon=3)
        got = {
            (r["k"], r["step"]): r["forecast"] for r in out.collect()
        }
        assert len(got) == 6
        from tuktu_spark.ml.timeseries import arima_fit as fit

        for k, xs in series.items():
            coeffs = fit(xs, 1, 0, 1)
            full = arima_forecast_series(xs, coeffs, 1, 0, 1, n_future=3)
            for step in (1, 2, 3):
                assert got[(k, step)] == pytest.approx(
                    full[len(xs) + step - 1], rel=1e-6
                )

    def test_short_series_skipped(self, spark):
        sdf = spark.createDataFrame([("a", 0, 1.0), ("a", 1, 2.0)], "k string, t int, v double")
        assert arima_forecast(sdf, ["k"], "t", "v", p=2, d=1, q=1).count() == 0
