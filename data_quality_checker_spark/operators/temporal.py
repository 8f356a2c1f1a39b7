"""Temporal / time-series operators — the TimeSeriesAnalyzer surface
(/root/reference/dataset_quality_checker/ts_analyzer.py) rebuilt on
window functions.

Scale note: an unpartitioned Window.orderBy(ts) serializes onto one
task, so every operator takes ``series_col`` — at corpus scale there is
always a series key (user, host, sensor). Passing None is allowed for
small diagnostics and documented as single-partition. Sequentially
recursive algorithms (EWMA, change points, ARIMA-ish forecasts) use
applyInPandas per series key — the per-key data is a bounded time
series, the parallelism is across keys."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "out_of_order_and_null_timestamps",
    "overlapping_intervals",
    "missing_timestamps",
    "monotonicity",
    "rolling_forecast",
    "spikes",
    "anomalies_zscore",
    "serial_correlation",
    "cross_correlation",
    "weekend_effects",
    "holiday_weekend_effects",
    "forecast_accuracy",
    "seasonal_strength",
    "ewma",
    "change_points",
    "partial_autocorrelation",
]


def _w(series_col: str | None, ts_col: str) -> Window:
    base = (
        Window.partitionBy(series_col) if series_col else Window.partitionBy()
    )
    return base.orderBy(ts_col)


def out_of_order_and_null_timestamps(
    df: DataFrame,
    ts_col: str,
    order_col: str,
    series_col: str | None = None,
) -> DataFrame:
    """Null-ts count + count of backwards steps (ts_analyzer.py:440-456,
    dq_checker.py:81-104). pandas implicitly uses row order; Spark rows
    are unordered, so arrival order must be an explicit column
    (sequence id, ingest offset). Returns one row
    (n_null_ts, n_out_of_order)."""
    w = _w(series_col, order_col)
    with_prev = df.withColumn("_prev", F.lag(ts_col).over(w))
    return with_prev.agg(
        F.sum(F.col(ts_col).isNull().cast("long")).alias("n_null_ts"),
        F.sum(
            (F.col(ts_col) < F.col("_prev")).cast("long")
        ).alias("n_out_of_order"),
    ).fillna(0)


def overlapping_intervals(
    df: DataFrame,
    start_col: str,
    end_col: str,
    series_col: str | None = None,
) -> DataFrame:
    """Rows whose interval overlaps the next interval in time order
    (dq_checker.py:106-118) — lead() over a sort, no self-join."""
    w = _w(series_col, start_col)
    return (
        df.withColumn("_next_start", F.lead(start_col).over(w))
        .filter(F.col("_next_start") < F.col(end_col))
        .drop("_next_start")
    )


_INTERVAL_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_to_seconds(interval: str) -> int:
    parts = interval.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _INTERVAL_SECONDS:
        raise ValueError(
            f"missing_timestamps: interval {interval!r} must be "
            f"'<n> <unit>' with unit in {sorted(_INTERVAL_SECONDS)}"
        )
    return int(parts[0]) * _INTERVAL_SECONDS[parts[1].lower()]


def missing_timestamps(
    df: DataFrame, ts_col: str, interval: str = "1 hour"
) -> DataFrame:
    """Expected grid minus observed (ts_analyzer.py:213-235):
    sequence(anchor, max, interval) -> explode -> left_anti. Returns
    `missing_ts` rows.

    The anchor is the min timestamp truncated to the interval's
    natural unit, and each OBSERVED timestamp is floored onto that
    grid (epoch arithmetic), so any '<n> <unit>' interval works —
    the old form hardcoded hour truncation and mis-bucketed every
    non-hourly interval (review finding). For '1 hour' the grid and
    bucketing are identical to before (the oracle twin's contract)."""
    step = _interval_to_seconds(interval)
    if step % 86400 == 0:
        unit = "day"
    elif step % 3600 == 0:
        unit = "hour"
    elif step % 60 == 0:
        unit = "minute"
    else:
        unit = "second"
    ts_type = dict(df.dtypes)[ts_col]

    def _epoch(c):
        # TIMESTAMP_NTZ cannot cast straight to long under ANSI; the
        # session is pinned UTC so the timestamp round-trip is exact
        return c.cast("timestamp").cast("long")

    bounds = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("lo"),
        F.max(ts_col).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval {interval}"))
        ).alias("missing_ts"),
        _epoch(F.col("lo")).alias("_anchor"),
    )
    observed = (
        df.select(_epoch(F.col(ts_col)).alias("_ts"))
        .crossJoin(
            F.broadcast(
                bounds.select(_epoch(F.col("lo")).alias("_anchor"))
            )
        )
        .select(
            F.timestamp_seconds(
                F.col("_anchor")
                + F.floor((F.col("_ts") - F.col("_anchor")) / step)
                * step
            )
            .cast(ts_type)
            .alias("missing_ts")
        )
        .distinct()
    )
    return grid.drop("_anchor").join(
        observed, on="missing_ts", how="left_anti"
    )


def monotonicity(
    df: DataFrame,
    col: str,
    ts_col: str,
    series_col: str | None = None,
) -> DataFrame:
    """Per series: is the column non-decreasing / non-increasing / strict
    (stat_analyzer.py:551-577). Returns (series?, non_decreasing,
    non_increasing, strictly_increasing)."""
    w = _w(series_col, ts_col)
    d = df.withColumn("_diff", F.col(col) - F.lag(col).over(w))
    keys = [series_col] if series_col else []
    grouped = d.groupBy(*keys) if keys else d.groupBy()
    # coalesce(min(...), true): a series with no non-null diffs (single
    # row, or all-null values) is vacuously monotone — matches SQL_MONO.
    # _has_null: interleaved NULL values make every adjacent diff NULL
    # (ignored by min), which would certify [5, NULL, 3] as strictly
    # increasing — pandas' is_monotonic is False for NaN series, so a
    # series containing any NULL value among non-null ones is not
    # monotone (review finding).
    has_null = F.max(F.col(col).isNull()) & F.max(
        F.col(col).isNotNull()
    )
    return grouped.agg(
        (
            F.coalesce(F.min(F.col("_diff") >= 0), F.lit(True))
            & ~has_null
        ).alias("non_decreasing"),
        (
            F.coalesce(F.min(F.col("_diff") <= 0), F.lit(True))
            & ~has_null
        ).alias("non_increasing"),
        (
            F.coalesce(F.min(F.col("_diff") > 0), F.lit(True))
            & ~has_null
        ).alias("strictly_increasing"),
    )


def rolling_forecast(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    window: int,
    series_col: str | None = None,
) -> DataFrame:
    """Trailing-mean one-step forecast (ts_analyzer.py:157-178):
    avg over rowsBetween(-window, -1)."""
    w = _w(series_col, ts_col).rowsBetween(-window, -1)
    return df.withColumn("forecast", F.avg(value_col).over(w))


def spikes(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    k: float = 3.0,
    series_col: str | None = None,
) -> DataFrame:
    """|delta| > k*std(delta) rows (ts_analyzer.py:604-628): lag diff,
    then a global (or per-series) std via a second window aggregate —
    two passes over a single shuffle."""
    w = _w(series_col, ts_col)
    d = df.withColumn(
        "_d", F.col(value_col) - F.lag(value_col).over(w)
    )
    wall = (
        Window.partitionBy(series_col) if series_col else Window.partitionBy()
    )
    d = d.withColumn("_sd", F.stddev_samp("_d").over(wall))
    return d.filter(F.abs(F.col("_d")) > k * F.col("_sd")).drop(
        "_sd", "_d"
    )


def anomalies_zscore(
    df: DataFrame,
    value_col: str,
    threshold: float = 3.0,
    series_col: str | None = None,
) -> DataFrame:
    """Rows with |z| > threshold (ts_analyzer.py:476-500); per-series
    stats via window aggregate when a key is given."""
    wall = (
        Window.partitionBy(series_col) if series_col else Window.partitionBy()
    )
    d = (
        df.withColumn("_m", F.avg(value_col).over(wall))
        .withColumn("_s", F.stddev_samp(value_col).over(wall))
    )
    return d.filter(
        (F.col("_s") > 0)
        & (F.abs((F.col(value_col) - F.col("_m")) / F.col("_s")) > threshold)
    ).drop("_m", "_s")


def serial_correlation(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    max_lag: int = 5,
    series_col: str | None = None,
) -> DataFrame:
    """ACF up to max_lag (ts_analyzer.py:502-526): k lag columns + one
    multi-corr aggregate. Returns (lag, acf)."""
    w = _w(series_col, ts_col)
    d = df
    for k in range(1, max_lag + 1):
        d = d.withColumn(f"_l{k}", F.lag(value_col, k).over(w))
    agg = d.agg(
        *[
            F.corr(value_col, f"_l{k}").alias(f"c{k}")
            for k in range(1, max_lag + 1)
        ]
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"), F.col(f"c{k}").alias("acf")
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("s")
    ).select("s.*")


def cross_correlation(
    df: DataFrame,
    col_a: str,
    col_b: str,
    ts_col: str,
    max_lag: int = 3,
    series_col: str | None = None,
) -> DataFrame:
    """corr(a, b shifted by lag) for lag in [-max_lag, max_lag]
    (ts_analyzer.py:630-667). Returns (lag, xcorr)."""
    w = _w(series_col, ts_col)
    d = df
    lags = list(range(-max_lag, max_lag + 1))
    for k in lags:
        shifted = (
            F.lag(col_b, k).over(w) if k >= 0 else F.lead(col_b, -k).over(w)
        )
        d = d.withColumn(f"_s{k + max_lag}", shifted)
    agg = d.agg(
        *[
            F.corr(col_a, f"_s{k + max_lag}").alias(f"c{k + max_lag}")
            for k in lags
        ]
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col(f"c{k + max_lag}").alias("xcorr"),
                    )
                    for k in lags
                ]
            )
        ).alias("s")
    ).select("s.*")


def weekend_effects(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """Mean value weekday vs weekend (ts_analyzer.py:669-700; holiday
    calendars join the same way as a broadcast dim). Returns
    (is_weekend, mean_value, n)."""
    return (
        df.withColumn(
            "is_weekend", F.dayofweek(ts_col).isin(1, 7)
        )
        .groupBy("is_weekend")
        .agg(
            F.avg(value_col).alias("mean_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def forecast_accuracy(
    df: DataFrame, actual: str, predicted: str
) -> DataFrame:
    """RMSE / MAE / MAPE / SMAPE / R2 / bias in one aggregate
    (ts_analyzer.py:264-327) — all distributive."""
    a, p = F.col(actual), F.col(predicted)
    err = a - p
    mean_a = F.avg(a)
    return df.agg(
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(F.abs(err)).alias("mae"),
        F.avg(
            F.when(a != 0, F.abs(err / a) * 100)
        ).alias("mape"),
        F.avg(
            F.when(
                (F.abs(a) + F.abs(p)) != 0,
                200 * F.abs(err) / (F.abs(a) + F.abs(p)),
            )
        ).alias("smape"),
        # SS_tot = n * var_pop(a), avoiding a second pass for mean(a).
        # Restricted to MATCHED rows (predicted non-null): SS_res only
        # sums matched rows, so an all-actuals denominator would
        # inflate r2 when predictions are missing (review finding)
        (
            F.lit(1.0)
            - F.sum(err * err)
            / (
                F.count(F.when(p.isNotNull(), a))
                * F.var_pop(F.when(p.isNotNull(), a))
            )
        ).alias("r2"),
        F.avg(err).alias("bias"),
    )


def seasonal_strength(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    period: int,
    series_col: str | None = None,
) -> DataFrame:
    """1 - var(residual of centered rolling mean) / var(value)
    (ts_analyzer.py:130-155) via a centered frame window."""
    half = period // 2
    w = _w(series_col, ts_col).rowsBetween(-half, half)
    d = df.withColumn("_trend", F.avg(value_col).over(w)).withColumn(
        "_resid", F.col(value_col) - F.col("_trend")
    )
    # aggregate PER SERIES when a key is given: a pooled var_samp
    # mixes between-series level offsets into the denominator and
    # reports phantom seasonality for flat multi-series inputs
    keys = [series_col] if series_col else []
    grouped = d.groupBy(*keys) if keys else d.groupBy()
    return grouped.agg(
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - F.var_samp("_resid") / F.var_samp(value_col),
        ).alias("seasonal_strength")
    )


def ewma(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    span: int,
    series_col: str,
) -> DataFrame:
    """Exponential moving average (ts_analyzer.py:107-128). Recursive
    state ⇒ not expressible as a frame window; runs as applyInPandas
    per series key (pandas ewm inside, parallelism across keys)."""
    alpha = 2.0 / (span + 1.0)

    def _ewm(pdf):
        pdf = pdf.sort_values(ts_col)
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=True).mean()
        return pdf

    from pyspark.sql.types import DoubleType, StructField, StructType

    # copy the fields: StructType.add would mutate df's cached schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField("ewma", DoubleType())]
    )
    return df.groupBy(series_col).applyInPandas(_ewm, schema=out_schema)


def change_points(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    series_col: str,
    min_segment: int = 5,
) -> DataFrame:
    """Mean-shift change points per series (ts_analyzer.py:39-105 uses
    ruptures PELT; this is a dependency-free binary-segmentation
    equivalent run per key inside applyInPandas). Returns
    (series, change_ts)."""
    import numpy as np
    import pandas as pd

    def _cost(x: "np.ndarray") -> float:
        return float(((x - x.mean()) ** 2).sum()) if len(x) else 0.0

    def _binseg(x, lo, hi, out, depth=0):
        if hi - lo < 2 * min_segment or depth > 6:
            return
        seg = x[lo:hi]
        base = _cost(seg)
        best_gain, best_i = 0.0, None
        for i in range(min_segment, len(seg) - min_segment):
            gain = base - _cost(seg[:i]) - _cost(seg[i:])
            if gain > best_gain:
                best_gain, best_i = gain, i
        # require a material variance reduction to split
        if best_i is not None and best_gain > 2.0 * seg.var() + 1e-12:
            out.append(lo + best_i)
            _binseg(x, lo, lo + best_i, out, depth + 1)
            _binseg(x, lo + best_i, hi, out, depth + 1)

    def _per_series(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=float)
        idx: list[int] = []
        _binseg(x, 0, len(x), idx)
        return pd.DataFrame(
            {
                "series": pdf[series_col].iloc[:1].repeat(len(idx)).tolist()
                if idx
                else [],
                "change_ts": [pdf[ts_col].iloc[i] for i in sorted(idx)],
            }
        )

    ts_type = dict(zip(df.columns, [f.dataType.simpleString() for f in df.schema.fields]))[ts_col]
    series_type = dict(
        zip(df.columns, [f.dataType.simpleString() for f in df.schema.fields])
    )[series_col]
    return df.groupBy(series_col).applyInPandas(
        _per_series, schema=f"series {series_type}, change_ts {ts_type}"
    )


def autoregressive_forecast(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    series_col: str,
    lags: int = 3,
    steps: int = 5,
) -> DataFrame:
    """AR(lags) forecast per series (ts_analyzer.py:237-262 used
    statsmodels AutoReg): least-squares fit + recursive forecast in
    numpy inside applyInPandas — parallel across series keys.
    Returns (series, step, forecast)."""
    import numpy as np
    import pandas as pd

    def _fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype=float)
        if len(y) <= lags + 1:
            return pd.DataFrame(
                {"series": [], "step": [], "forecast": []}
            ).astype({"step": "int32", "forecast": "float64"})
        rows = np.stack(
            [y[i : len(y) - lags + i] for i in range(lags)], axis=1
        )
        target = y[lags:]
        a = np.hstack([np.ones((len(target), 1)), rows])
        coef, *_ = np.linalg.lstsq(a, target, rcond=None)
        hist = list(y[-lags:])
        preds = []
        for _ in range(steps):
            nxt = coef[0] + float(np.dot(coef[1:], hist[-lags:]))
            preds.append(nxt)
            hist.append(nxt)
        key = pdf[series_col].iloc[0]
        return pd.DataFrame(
            {
                "series": [key] * steps,
                "step": np.arange(1, steps + 1, dtype="int32"),
                "forecast": preds,
            }
        )

    series_type = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }[series_col]
    return df.groupBy(series_col).applyInPandas(
        _fit, schema=f"series {series_type}, step int, forecast double"
    )


def seasonal_decompose(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    series_col: str,
    period: int,
) -> DataFrame:
    """Additive decomposition per series (ts_analyzer.py:329-386,
    458-474): centered-MA trend, mean-by-phase seasonal, residual —
    numpy inside applyInPandas. Returns the input grain +
    trend/seasonal/resid columns."""
    import numpy as np
    import pandas as pd

    def _dec(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        y = pdf[value_col].to_numpy(dtype=float)
        n = len(y)
        trend = np.full(n, np.nan)
        if n >= period:
            kernel = np.ones(period) / period
            conv = np.convolve(y, kernel, mode="valid")
            start = (period - 1) // 2
            trend[start : start + len(conv)] = conv
        detr = y - trend
        seasonal = np.zeros(n)
        for phase in range(period):
            vals = detr[phase::period]
            vals = vals[~np.isnan(vals)]
            if len(vals):
                seasonal[phase::period] = vals.mean()
        seasonal -= np.nanmean(seasonal)
        out = pdf.copy()
        out["trend"] = trend
        out["seasonal"] = seasonal
        out["resid"] = y - trend - seasonal
        return out

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("trend", DoubleType()),
            StructField("seasonal", DoubleType()),
            StructField("resid", DoubleType()),
        ]
    )
    return df.groupBy(series_col).applyInPandas(_dec, schema=out_schema)


def fourier_top_frequencies(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    series_col: str,
    top_k: int = 3,
) -> DataFrame:
    """Dominant FFT frequencies per series (ts_analyzer.py:180-211).
    Returns (series, freq_idx, amplitude)."""
    import numpy as np
    import pandas as pd

    def _fft(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype=float)
        if len(y) < 4:
            return pd.DataFrame(
                {"series": [], "freq_idx": [], "amplitude": []}
            ).astype({"freq_idx": "int32", "amplitude": "float64"})
        amp = np.abs(np.fft.rfft(y - y.mean()))
        idx = np.argsort(-amp)[:top_k]
        key = pdf[series_col].iloc[0]
        return pd.DataFrame(
            {
                "series": [key] * len(idx),
                "freq_idx": idx.astype("int32"),
                "amplitude": amp[idx],
            }
        )

    series_type = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }[series_col]
    return df.groupBy(series_col).applyInPandas(
        _fft,
        schema=f"series {series_type}, freq_idx int, amplitude double",
    )


def holt_winters_forecast(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    series_col: str,
    period: int,
    steps: int = 5,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """Additive Holt-Winters forecast per series
    (ts_analyzer.py:560-602 used statsmodels ExponentialSmoothing;
    this is the dependency-free additive triple-smoothing recursion in
    numpy inside applyInPandas). Returns (series, step, forecast)."""
    import numpy as np
    import pandas as pd

    def _hw(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype=float)
        key = pdf[series_col].iloc[0]
        if len(y) < 2 * period:
            return pd.DataFrame(
                {"series": [], "step": [], "forecast": []}
            ).astype({"step": "int32", "forecast": "float64"})
        level = y[:period].mean()
        trend = (y[period : 2 * period].mean() - y[:period].mean()) / period
        season = list(y[:period] - level)
        for i in range(len(y)):
            s = season[i % period]
            new_level = alpha * (y[i] - s) + (1 - alpha) * (level + trend)
            trend = beta * (new_level - level) + (1 - beta) * trend
            season[i % period] = gamma * (y[i] - new_level) + (1 - gamma) * s
            level = new_level
        preds = [
            level + (h + 1) * trend + season[(len(y) + h) % period]
            for h in range(steps)
        ]
        return pd.DataFrame(
            {
                "series": [key] * steps,
                "step": np.arange(1, steps + 1, dtype="int32"),
                "forecast": preds,
            }
        )

    series_type = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }[series_col]
    return df.groupBy(series_col).applyInPandas(
        _hw, schema=f"series {series_type}, step int, forecast double"
    )


def dickey_fuller_stat(
    df: DataFrame, value_col: str, ts_col: str, series_col: str
) -> DataFrame:
    """Simplified (no-lag) Dickey-Fuller t-statistic per series
    (ts_analyzer.py:388-438 used statsmodels adfuller): regress
    delta_y on y_{t-1} + intercept; t << -2.9 suggests stationarity.
    Statistic only — p-values need the DF distribution tables.
    Returns (series, df_stat, n)."""
    import numpy as np
    import pandas as pd

    def _adf(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype=float)
        key = pdf[series_col].iloc[0]
        if len(y) < 10:
            return pd.DataFrame({"series": [], "df_stat": [], "n": []}).astype(
                {"df_stat": "float64", "n": "int64"}
            )
        dy = np.diff(y)
        ylag = y[:-1]
        a = np.stack([np.ones_like(ylag), ylag], axis=1)
        coef, res, *_ = np.linalg.lstsq(a, dy, rcond=None)
        resid = dy - a @ coef
        dof = len(dy) - 2
        s2 = float(resid @ resid) / dof
        try:
            cov = s2 * np.linalg.inv(a.T @ a)
            t = (
                coef[1] / math.sqrt(cov[1, 1])
                if cov[1, 1] > 0
                else float("nan")
            )
        except np.linalg.LinAlgError:
            # constant series (stuck sensor): singular a.T@a — NaN
            # for THIS series instead of killing the whole job
            t = float("nan")
        return pd.DataFrame(
            {"series": [key], "df_stat": [float(t)], "n": [len(y)]}
        )

    series_type = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }[series_col]
    return df.groupBy(series_col).applyInPandas(
        _adf, schema=f"series {series_type}, df_stat double, n long"
    )


def partial_autocorrelation(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    max_lag: int = 5,
    series_col: str | None = None,
) -> list[tuple[int, float]]:
    """PACF up to max_lag — the missing half of identify_seasonality
    (ts_analyzer.py:502-526 computes ACF; statsmodels pacf was the
    reference's companion). Distributed part: the ACF aggregate
    (serial_correlation, one pass). Driver part: the Durbin-Levinson
    recursion over those max_lag scalars — O(max_lag^2) arithmetic on
    a handful of numbers, the prescribed sufficient-statistics split
    (SURVEY.md §2.10). Returns [(lag, pacf)], lag 1..max_lag."""
    acf_rows = serial_correlation(
        df, value_col, ts_col, max_lag, series_col
    ).collect()
    rho = {r["lag"]: r["acf"] for r in acf_rows}
    if any(rho.get(k) is None for k in range(1, max_lag + 1)):
        return [(k, float("nan")) for k in range(1, max_lag + 1)]
    # Durbin-Levinson: phi[k][k] is the lag-k partial autocorrelation
    phi_prev: list[float] = []
    out: list[tuple[int, float]] = []
    for k in range(1, max_lag + 1):
        if k == 1:
            phi_kk = rho[1]
        else:
            num = rho[k] - sum(
                phi_prev[j] * rho[k - 1 - j] for j in range(k - 1)
            )
            den = 1.0 - sum(
                phi_prev[j] * rho[j + 1] for j in range(k - 1)
            )
            phi_kk = num / den if den else float("nan")
        phi_k = [
            phi_prev[j] - phi_kk * phi_prev[k - 2 - j]
            for j in range(k - 1)
        ] + [phi_kk]
        phi_prev = phi_k
        out.append((k, phi_kk))
    return out


def holiday_weekend_effects(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    holidays: tuple[str, ...] = (),
) -> DataFrame:
    """weekend_effects with a holiday calendar (the broadcast-dim leg
    of check_weekend_holiday_effects, ts_analyzer.py:669-700): a day
    is an off-day when it is a weekend OR its date is in ``holidays``
    (ISO date strings — the calendar is a tiny literal/broadcast dim,
    exactly how a real holiday table joins at scale). Returns
    (is_offday, mean_value, n)."""
    date = F.to_date(ts_col)
    if holidays:
        hol = F.array(*[F.lit(h) for h in holidays])
        is_off = F.dayofweek(ts_col).isin(1, 7) | F.array_contains(
            hol, date.cast("string")
        )
    else:
        is_off = F.dayofweek(ts_col).isin(1, 7)
    return (
        df.withColumn("is_offday", is_off)
        .groupBy("is_offday")
        .agg(
            F.avg(value_col).alias("mean_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )
