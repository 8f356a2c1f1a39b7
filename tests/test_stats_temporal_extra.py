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


def test_shapiro_wilk_royston(spark):
    """Royston AS R94: exact W=1 for the symmetric n=3 case, accepts a
    seeded normal sample, rejects an exponential one (the reference's
    check_normality Shapiro branch, stat_analyzer.py:375-403)."""
    import numpy as np

    from data_quality_checker_spark.operators import stats as S

    w, p = S._swilk([1.0, 2.0, 3.0])
    assert w == 1.0 and p == 1.0
    # scipy reference value for [1,2,3,4,5]: W=0.986766, p=0.967414
    w5, p5 = S._swilk([1.0, 2.0, 3.0, 4.0, 5.0])
    assert abs(w5 - 0.986766) < 5e-4 and abs(p5 - 0.9674) < 5e-3

    rng = np.random.RandomState(11)
    norm = spark.createDataFrame(
        [(float(v),) for v in rng.normal(50, 5, 3000)], "v double"
    )
    expo = spark.createDataFrame(
        [(float(v),) for v in rng.exponential(2.0, 3000)], "v double"
    )
    rn = S.shapiro_wilk(norm, "v")
    re_ = S.shapiro_wilk(expo, "v")
    assert rn["w"] > 0.99 and rn["p_value"] > 0.05
    assert re_["w"] < 0.95 and re_["p_value"] < 1e-6
    assert rn["n"] <= 2 * 5000 and re_["n"] <= 2 * 5000
    # bounded: the cap is approximate (~1.2*max_n expected from the
    # Bernoulli sample, 2*max_n hard bound) — an exact limit() after
    # sample() took rows in partition order and truncated the value
    # range on sorted data (found by review, regression below)
    capped = S.shapiro_wilk(norm, "v", max_n=100)
    assert capped["n"] <= 200

    # regression: a SORTED normal column must still read as normal
    sorted_norm = spark.createDataFrame(
        [(float(v),) for v in sorted(rng.normal(50, 5, 3000))],
        "v double",
    ).coalesce(1)
    rs = S.shapiro_wilk(sorted_norm, "v", max_n=500)
    assert rs["p_value"] > 0.05, rs

    # regression (review finding): NaN rows must be excluded like
    # nulls — the shared sampler's isNotNull filter alone lets NaN
    # through and one NaN poisons the whole W statistic
    import math

    with_nan = spark.createDataFrame(
        [(float(v),) for v in rng.normal(50, 5, 1500)]
        + [(float("nan"),)] * 30 + [(None,)] * 30,
        "v double",
    )
    rnan = S.shapiro_wilk(with_nan, "v", max_n=500)
    assert math.isfinite(rnan["w"]) and rnan["p_value"] > 0.05, rnan


def test_holiday_weekend_effects(spark):
    from pyspark.sql import functions as F

    from data_quality_checker_spark.operators import temporal as T

    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", 100.0),  # Monday, holiday
            ("2024-01-02 10:00:00", 1.0),    # Tuesday
            ("2024-01-06 10:00:00", 50.0),   # Saturday
            ("2024-01-03 10:00:00", 3.0),    # Wednesday
        ],
        "ts_s string, value double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "value")
    got = {
        r["is_offday"]: r
        for r in T.holiday_weekend_effects(
            df, "ts", "value", ("2024-01-01",)
        ).collect()
    }
    assert got[True]["n"] == 2 and got[True]["mean_value"] == 75.0
    assert got[False]["n"] == 2 and got[False]["mean_value"] == 2.0
    # without the calendar the holiday Monday is a weekday
    plain = {
        r["is_offday"]: r
        for r in T.holiday_weekend_effects(df, "ts", "value").collect()
    }
    assert plain[False]["n"] == 3
