"""Tests for the round-1 late additions: Jarque-Bera, Bartlett, AR
forecast, seasonal decomposition, FFT top frequencies."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from data_quality_checker_spark.operators import stats as S
from data_quality_checker_spark.operators import temporal as T


def test_jarque_bera_normal_vs_skewed(spark):
    rng = np.random.RandomState(11)
    normal = spark.createDataFrame(
        [(float(x),) for x in rng.normal(0, 1, 2000)], "x double"
    )
    skewed = spark.createDataFrame(
        [(float(x),) for x in rng.exponential(1, 2000)], "x double"
    )
    jb_n = S.jarque_bera(normal, "x")
    jb_s = S.jarque_bera(skewed, "x")
    assert jb_n["jb"] < 10 < jb_s["jb"]
    assert jb_n["p_value"] > 0.001 > jb_s["p_value"]


def test_bartlett(spark):
    rng = np.random.RandomState(12)
    rows = [("a", float(x)) for x in rng.normal(0, 1, 300)] + [
        ("b", float(x)) for x in rng.normal(0, 5, 300)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    res = S.bartlett_test(df, "g", "v")
    assert res["statistic"] > 50  # wildly different variances
    same = spark.createDataFrame(
        [("a", float(x)) for x in rng.normal(0, 1, 300)]
        + [("b", float(x)) for x in rng.normal(0, 1, 300)],
        "g string, v double",
    )
    assert S.bartlett_test(same, "g", "v")["statistic"] < 10


def test_autoregressive_forecast(spark):
    base = dt.datetime(2024, 1, 1)
    # AR(1): y_t = 0.5 y_{t-1} + 10
    y = [20.0]
    for _ in range(59):
        y.append(0.5 * y[-1] + 10.0)
    df = spark.createDataFrame(
        [(base + dt.timedelta(hours=i), y[i], "s") for i in range(60)],
        "ts timestamp, v double, k string",
    )
    out = {
        r["step"]: r["forecast"]
        for r in T.autoregressive_forecast(
            df, "v", "ts", "k", lags=2, steps=3
        ).collect()
    }
    # series converges to 20; forecasts should be ~20
    assert all(abs(out[s] - 20.0) < 0.5 for s in (1, 2, 3))


def test_seasonal_decompose_recovers_period(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(48):
        seasonal = 5.0 if i % 4 == 0 else -1.0
        rows.append(
            (base + dt.timedelta(hours=i), 10.0 + seasonal + 0.1 * i, "s")
        )
    df = spark.createDataFrame(rows, "ts timestamp, v double, k string")
    out = T.seasonal_decompose(df, "v", "ts", "k", period=4)
    rows_out = out.orderBy("ts").collect()
    mids = [r for r in rows_out if r["trend"] is not None]
    # seasonal at phase 0 markedly above other phases
    phase0 = [r["seasonal"] for i, r in enumerate(rows_out) if i % 4 == 0]
    phase1 = [r["seasonal"] for i, r in enumerate(rows_out) if i % 4 == 1]
    assert min(phase0) > max(phase1)
    # trend roughly linear: residuals small in the interior
    assert all(abs(r["resid"]) < 1.5 for r in mids)


def test_fourier_top_frequencies(spark):
    base = dt.datetime(2024, 1, 1)
    n, period = 64, 8
    rows = [
        (
            base + dt.timedelta(hours=i),
            math.sin(2 * math.pi * i / period) * 10,
            "s",
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double, k string")
    top = T.fourier_top_frequencies(df, "v", "ts", "k", top_k=1).collect()
    assert top[0]["freq_idx"] == n // period  # bin 8 = the sine frequency
