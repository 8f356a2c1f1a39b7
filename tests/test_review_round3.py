"""Regressions for the round-3 review findings in
quality.py / temporal.py / nlp.py."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_quality_checker_spark.operators import quality as Q
from data_quality_checker_spark.operators import temporal as T


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_missing_timestamps_non_hourly_intervals(spark):
    """15-minute and daily grids bucket observed values onto the grid
    instead of hour-truncating them (the old behavior reported every
    non-hourly grid point missing)."""
    rows = [(_ts(9, 0),), (_ts(9, 15),), (_ts(9, 45),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    missing = [
        r["missing_ts"]
        for r in T.missing_timestamps(df, "ts", "15 minutes").collect()
    ]
    assert missing == [_ts(9, 30)]

    daily = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 10),),
            (datetime.datetime(2024, 1, 3, 11),),
        ],
        "ts timestamp",
    )
    missing_days = [
        r["missing_ts"]
        for r in T.missing_timestamps(daily, "ts", "1 day").collect()
    ]
    # day 2 missing; days 1 and 3 observed despite non-midnight times
    assert missing_days == [datetime.datetime(2024, 1, 2)]


def test_dickey_fuller_constant_series_returns_nan(spark):
    import math

    rows = [(i, 0.0, "stuck") for i in range(20)] + [
        (i, float(i % 7) + i * 0.1, "ok") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "ts int, value double, k string")
    out = {
        r["series"]: r["df_stat"]
        for r in T.dickey_fuller_stat(
            df, "value", "ts", series_col="k"
        ).collect()
    }
    # no job-kill; NaN arrives as None through Arrow
    v = out["stuck"]
    assert v is None or math.isnan(v)
    assert out["ok"] is not None and not math.isnan(out["ok"])


def test_unexpected_values_flags_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "zzz")], ["id", "status"]
    )
    got = {
        r["id"] for r in Q.unexpected_values(df, "status", ["a", "b"]).collect()
    }
    assert got == {3, 4}  # NULL is outside any allowlist


def test_seasonal_strength_per_series(spark):
    """Two flat-noise series with different LEVELS must not read as
    seasonal; per-series rows are returned when series_col is given."""
    import numpy as np

    rng = np.random.default_rng(13)
    rows = []
    for k, base in (("a", 0.0), ("b", 1000.0)):
        for i in range(200):
            rows.append((k, i, base + float(rng.normal())))
    df = spark.createDataFrame(rows, "k string, ts int, value double")
    out = {
        r["k"]: r["seasonal_strength"]
        for r in T.seasonal_strength(
            df, "value", "ts", period=10, series_col="k"
        ).collect()
    }
    assert set(out) == {"a", "b"}
    assert all(v < 0.6 for v in out.values()), out


def test_forecast_accuracy_r2_matched_rows_only(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (10.0, 10.0), (20.0, None)],
        "actual double, predicted double",
    )
    r = T.forecast_accuracy(df, "actual", "predicted").collect()[0]
    # perfect on the 2 matched rows; denominator must not include the
    # unmatched third actual (which would also claim r2 == 1.0 while
    # hiding that a third of predictions are missing) — matched-only
    # var over [0,10] gives a real denominator
    assert r["r2"] == 1.0


def test_monotonicity_null_interleaved_not_monotone(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 3.0)], "ts int, v double"
    )
    r = T.monotonicity(df, "v", "ts").collect()[0]
    assert not r["strictly_increasing"]
    assert not r["non_decreasing"] and not r["non_increasing"]
    # all-null stays vacuously monotone (unchanged contract)
    alln = spark.createDataFrame(
        [(1, None), (2, None)], "ts int, v double"
    )
    r2 = T.monotonicity(alln, "v", "ts").collect()[0]
    assert r2["non_decreasing"]


def test_spikes_drops_helper_columns(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 0.1), (3, 50.0), (4, 0.2), (5, 0.1)],
        "ts int, value double",
    )
    out = T.spikes(df, "value", "ts", k=1.5)
    assert set(out.columns) == set(df.columns)


def test_repetition_token_frac_clamped(spark):
    from data_quality_checker_spark.operators.nlp import (
        repetition_ngram_metrics,
    )

    df = spark.createDataFrame([(1, "a a a a a")], ["doc_id", "text"])
    out = {
        r["n"]: r["token_frac"]
        for r in repetition_ngram_metrics(df).collect()
    }
    assert all(v <= 1.0 for v in out.values()), out
    assert out[2] == 1.0  # 4 overlapping 'a a' hits clamp to 1


def test_duplicate_columns_sample_rows_used(spark):
    df = spark.createDataFrame(
        [(i, i, i if i < 50 else -i) for i in range(100)],
        ["a", "b", "c"],
    )
    full = {tuple(r) for r in Q.duplicate_columns(df).collect()}
    assert full == {("a", "b")}
    # sampled over the first 50 rows, c also matches — proving the
    # parameter now actually bounds the scan
    sampled = {
        tuple(r)
        for r in Q.duplicate_columns(df.orderBy("a"), sample_rows=50).collect()
    }
    assert ("a", "c") in sampled


def test_rake_keywords_no_global_sort_of_all_phrases(spark):
    from data_quality_checker_spark.operators.nlp import rake_keywords

    docs = spark.createDataFrame(
        [(i, "good data quality and strong spark pipelines") for i in range(20)],
        ["doc_id", "text"],
    )
    out = rake_keywords(docs, top_k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = out.collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert 1 <= len(rows) <= 3


def test_stats_degenerate_inputs_no_crash(spark):
    """Batch-5 review regressions: NULL-psi bucketing, singleton
    groups, zero-variance welch, empty numeric-column sets, constant
    histogram, levene degenerate groups, null salted keys."""
    import math

    from data_quality_checker_spark.operators import stats as S
    from data_quality_checker_spark.sources.io import salted_key

    # psi ignores NULLs instead of binning them into the top bucket
    base = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)], "x double"
    )
    cur_nulls = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)]
        + [(None,)] * 40,
        "x double",
    )
    assert abs(S.psi(cur_nulls, base, "x")) < 1e-9  # same distribution

    # singleton group -> clear error, not TypeError
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "g string, v double"
    )
    import pytest

    with pytest.raises(ValueError, match="fewer than 2"):
        S.welch_t_test(df, "g", "v")

    # both groups constant -> nan, not ZeroDivisionError
    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "g string, v double",
    )
    assert math.isnan(S.welch_t_test(const, "g", "v")["t"])

    # one/zero numeric columns -> empty results, not agg(*[]) crash
    one = spark.createDataFrame([(1.0, "x")], ["v", "s"])
    assert S.correlation_pairs(one).count() == 0
    assert S.data_leaks(one, "v").count() == 0
    assert S.low_variance_features(one.select("s"), 0.1).count() == 0
    assert S.skewness_kurtosis(one.select("s")).count() == 0
    assert S.vif(one) == {"v": 1.0}

    # constant-range histogram -> single bucket, not DIVIDE_BY_ZERO
    h = S.histogram(base, "x", 10, 5.0, 5.0).collect()
    assert len(h) == 1 and h[0]["bucket"] == 0 and h[0]["n"] == 100

    # levene with all-constant groups -> NULL W, no crash
    r = S.levene_statistic(const, "g", "v").collect()[0]
    assert r["w"] is None

    # null keys salt to an explicit '(null)' group, not bare digits
    sk = spark.createDataFrame(
        [(None, "u1"), (None, "u2"), ("h", "u3")], "k string, u string"
    ).select(salted_key("k", "u", 4).alias("s"))
    keys = {r["s"].split("#")[0] for r in sk.collect()}
    assert keys == {"(null)", "h"}


def test_detect_multimodal_edge_modes(spark):
    """A mode at the range edge (exponential-like data) is detected."""
    import numpy as np

    from data_quality_checker_spark.operators import stats as S

    rng = np.random.default_rng(17)
    df = spark.createDataFrame(
        [(float(v),) for v in rng.exponential(1.0, 4000)], "x double"
    )
    out = S.detect_multimodal(df, "x")
    assert out["n_peaks"] == 1 and out["peak_buckets"][0] == 0


def test_extract_lenient_on_malformed_bytes(spark):
    """One invalid-UTF-8 crawl page must not abort extraction (ANSI
    F.decode threw MALFORMED_CHARACTER_CODING; lenient cast decodes
    with replacement chars)."""
    from data_quality_checker_spark.plans.extract import (
        with_extracted_text,
    )

    df = spark.createDataFrame(
        [
            (1, bytearray(b"<p>ok</p>\xff\xfe bad")),
            (2, bytearray(b"<html><body></body></html>")),
        ],
        "id long, html binary",
    )
    rows = {r["id"]: r["text"] for r in with_extracted_text(df).collect()}
    assert "ok" in rows[1]
    # empty markup extracts to NULL (ready-text semantics: fires only
    # the `empty` rule, not `empty` + `too_short`)
    assert rows[2] is None


def test_streaming_digest_distinguishes_null_from_empty(spark):
    from data_quality_checker_spark.streaming.dedup_stream import (
        with_content_digest,
    )

    df = spark.createDataFrame([(1, None), (2, "")], "id long, text string")
    keys = {
        r["id"]: r["content_md5"]
        for r in with_content_digest(df).collect()
    }
    assert keys[1] != keys[2]  # null doc is not the empty doc


def test_windowed_counts_value_col_optional(spark):
    import datetime

    from data_quality_checker_spark.streaming.windowed import (
        windowed_event_counts,
    )

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 1), "click")],
        "ts timestamp, event_type string",
    )
    out = windowed_event_counts(df, value_col=None).collect()
    assert out[0]["n"] == 1 and out[0]["mean_value"] is None


def test_udf_tokenizer_matches_oracle_on_nbsp(spark):
    """The UDF fallback tokenizer pins the Java-\\s class: NBSP-joined
    tokens must score identically to oracle.detect_lang."""
    from data_quality_checker_spark.plans import oracle as O
    from data_quality_checker_spark.plans.udfs import detect_lang_python

    t = "the\xa0of\xa0and\xa0in la la el los de en"
    assert detect_lang_python(t) == O.detect_lang(t)
