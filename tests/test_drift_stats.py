"""Drift/uniformity/Levene/multi-normality vs pure-numpy references.

These pin the math of operators/drift.py and the new stats.py tests
independently of the DuckDB oracle queries (which pin cross-engine
agreement): each test recomputes the statistic with a 5-line numpy
implementation of the textbook formula.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.operators import drift as DR
from data_quality_checker_spark.operators import stats as S

def _ks_two_sample_ref(a: np.ndarray, b: np.ndarray) -> float:
    pts = np.sort(np.unique(np.concatenate([a, b])))
    fa = np.searchsorted(np.sort(a), pts, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pts, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def _ks_uniform_ref(x: np.ndarray) -> float:
    x = np.sort(x)
    f = (x - x[0]) / (x[-1] - x[0])
    n = len(x)
    hi = np.arange(1, n + 1) / n - f
    lo = f - np.arange(0, n) / n
    return float(max(hi.max(), lo.max()))


def _levene_ref(groups: list[np.ndarray]) -> float:
    z = [np.abs(g - np.median(g)) for g in groups]
    n = np.array([len(zi) for zi in z], dtype=float)
    m = np.array([zi.mean() for zi in z])
    v = np.array([zi.var(ddof=1) for zi in z])
    big_n, k = n.sum(), len(z)
    grand = (n * m).sum() / big_n
    ssb = (n * (m - grand) ** 2).sum()
    ssw = ((n - 1) * v).sum()
    return float(((big_n - k) / (k - 1)) * ssb / ssw)


def test_prefix_sums_matches_cumsum(spark):
    RNG = np.random.default_rng(1)
    vals = RNG.integers(0, 50, size=500)  # ties on purpose
    counts = RNG.integers(1, 9, size=500)
    df = spark.createDataFrame(
        [(int(v), int(c)) for v, c in zip(vals, counts)], "v int, c int"
    ).groupBy("v").agg(F.sum("c").alias("c"))
    got = {
        r["v"]: r["cum_c"]
        for r in DR.prefix_sums(df, "v", ["c"], partitions=7).collect()
    }
    pdf = df.toPandas().sort_values("v")
    want = dict(zip(pdf["v"], pdf["c"].cumsum().astype(float)))
    assert got == want


def test_ks_two_sample_matches_numpy(spark):
    RNG = np.random.default_rng(2)
    a = RNG.normal(0.0, 1.0, 400)
    b = RNG.normal(0.4, 1.3, 300)
    rows = [(float(x), True) for x in a] + [(float(x), False) for x in b]
    df = spark.createDataFrame(rows, "value double, cur boolean")
    row = DR.ks_two_sample(df, "value", F.col("cur"), partitions=5).first()
    assert row["n_current"] == 400 and row["n_baseline"] == 300
    assert row["d"] == pytest.approx(_ks_two_sample_ref(a, b), abs=1e-12)
    assert 0.0 <= row["p_value"] <= 1.0


def test_ks_two_sample_identical_samples_d_zero(spark):
    RNG = np.random.default_rng(3)
    x = RNG.normal(size=200)
    rows = [(float(v), t) for v in x for t in (True, False)]
    df = spark.createDataFrame(rows, "value double, cur boolean")
    row = DR.ks_two_sample(df, "value", F.col("cur")).first()
    assert row["d"] == pytest.approx(0.0, abs=1e-12)
    assert row["p_value"] == pytest.approx(1.0, abs=1e-9)


def test_ks_uniformity_matches_numpy(spark):
    RNG = np.random.default_rng(4)
    x = RNG.exponential(2.0, 500)
    df = spark.createDataFrame([(float(v),) for v in x], "value double")
    row = DR.ks_uniformity(df, "value", partitions=5).first()
    assert row["n"] == 500
    assert row["d"] == pytest.approx(_ks_uniform_ref(x), abs=1e-12)
    # exponential data is decisively non-uniform
    assert row["p_value"] < 0.01


def test_ks_uniformity_accepts_uniform(spark):
    RNG = np.random.default_rng(5)
    x = RNG.uniform(0.0, 10.0, 2000)
    df = spark.createDataFrame([(float(v),) for v in x], "value double")
    row = DR.ks_uniformity(df, "value").first()
    assert row["p_value"] > 0.05


def test_chi2_uniformity(spark):
    counts = {"a": 100, "b": 120, "c": 80}
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "cat string")
    row = DR.chi2_uniformity(df, "cat").first()
    n, k = 300, 3
    e = n / k
    want = sum((o - e) ** 2 / e for o in counts.values())
    assert row["chi2"] == pytest.approx(want, rel=1e-12)
    assert row["dof"] == k - 1 and row["n"] == n


def test_uniformity_test_dict_api(spark):
    RNG = np.random.default_rng(6)
    df = spark.createDataFrame(
        [(float(v),) for v in RNG.uniform(size=1000)], "value double"
    )
    out = DR.uniformity_test(df, "value", numeric=True)
    assert set(out) == {"statistic", "p_value", "is_uniform"}
    assert out["is_uniform"] is np.True_ or out["is_uniform"] is True


def test_levene_matches_numpy(spark):
    RNG = np.random.default_rng(7)
    groups = {
        "a": RNG.normal(0, 1.0, 150),
        "b": RNG.normal(0, 2.5, 120),
        "c": RNG.normal(1, 1.0, 180),
    }
    rows = [(g, float(v)) for g, arr in groups.items() for v in arr]
    df = spark.createDataFrame(rows, "g string, value double")
    row = S.levene_statistic(df, "g", "value").first()
    assert row["w"] == pytest.approx(
        _levene_ref(list(groups.values())), rel=1e-9
    )
    assert row["dof1"] == 2 and row["dof2"] == 450 - 3
    out = S.levene_test(df, "g", "value")
    assert out["test_statistic"] == pytest.approx(row["w"], rel=1e-12)


def test_multivariate_normality_flags(spark):
    RNG = np.random.default_rng(8)
    n = 4000
    rows = [
        (float(a), float(b))
        for a, b in zip(RNG.normal(size=n), RNG.exponential(size=n))
    ]
    df = spark.createDataFrame(rows, "norm double, expo double")
    out = {
        r["column"]: r
        for r in S.multivariate_normality(df, ["norm", "expo"]).collect()
    }
    assert out["norm"]["normal"] and out["norm"]["p_value"] > 0.05
    assert not out["expo"]["normal"] and out["expo"]["p_value"] < 0.01
    # jb must equal the moment formula recomputed in numpy
    x = np.array([r[0] for r in rows])
    sk = ((x - x.mean()) ** 3).mean() / x.std() ** 3
    ku = ((x - x.mean()) ** 4).mean() / x.std() ** 4 - 3
    want = n / 6 * (sk**2 + ku**2 / 4)
    assert out["norm"]["jb"] == pytest.approx(want, rel=1e-6)


def test_pacf_ar1(spark):
    """PACF of an AR(1) process: lag-1 ~ phi, higher lags ~ 0
    (Durbin-Levinson over the distributed ACF)."""
    from data_quality_checker_spark.operators import temporal as T

    RNG = np.random.default_rng(9)
    phi, n = 0.7, 4000
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + RNG.normal()
    rows = [(i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "ts int, value double")
    pacf = dict(T.partial_autocorrelation(df, "value", "ts", max_lag=4))
    assert pacf[1] == pytest.approx(phi, abs=0.06)
    for k in (2, 3, 4):
        assert abs(pacf[k]) < 0.08


def test_prefix_sums_deterministic_across_runs(spark):
    """Regression: repartitionByRange's sampler is not stable across
    jobs, which once skewed the offsets (round-2 fix: deterministic
    approxQuantile buckets). Two evaluations must agree exactly, and
    match a single-partition-window reference."""
    from pyspark.sql import Window

    RNG = np.random.default_rng(11)
    df = (
        spark.createDataFrame(
            [(float(v),) for v in RNG.normal(size=50_000)], "v double"
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    runs = []
    for _ in range(2):
        agg = (
            DR.prefix_sums(df, "v", ["c"], partitions=16)
            .agg(F.sum(F.col("v") * F.col("cum_c")).alias("chk"))
            .first()["chk"]
        )
        runs.append(agg)
    assert runs[0] == runs[1]
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ref = (
        df.withColumn("cum_c", F.sum("c").over(w).cast("double"))
        .agg(F.sum(F.col("v") * F.col("cum_c")).alias("chk"))
        .first()["chk"]
    )
    assert runs[0] == pytest.approx(ref, rel=1e-12)


def test_vif_matches_regression_r2(spark):
    """VIF via inv(corr-matrix) diagonal must equal 1/(1-R^2) of the
    per-column OLS regression (recomputed in numpy)."""
    RNG = np.random.default_rng(12)
    n = 2000
    x1 = RNG.normal(size=n)
    x2 = 0.8 * x1 + 0.6 * RNG.normal(size=n)   # correlated with x1
    x3 = RNG.normal(size=n)                      # independent
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, x3)],
        "x1 double, x2 double, x3 double",
    )
    got = S.vif(df, ["x1", "x2", "x3"])

    X = np.column_stack([x1, x2, x3])
    for j, c in enumerate(["x1", "x2", "x3"]):
        y = X[:, j]
        others = np.delete(X, j, axis=1)
        A = np.column_stack([np.ones(n), others])
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        resid = y - A @ beta
        r2 = 1 - resid.var() / y.var()
        assert got[c] == pytest.approx(1.0 / (1.0 - r2), rel=1e-6)
    assert got["x3"] == pytest.approx(1.0, abs=0.05)
    assert got["x1"] > 1.5 and got["x2"] > 1.5


def test_bootstrap_ci_covers_true_mean_and_is_deterministic(spark):
    RNG = np.random.default_rng(13)
    xs = RNG.normal(50.0, 5.0, 3000)
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xs)], "id long, v double"
    )
    ci1 = S.bootstrap_mean_ci(df, "v", "id", n_boot=80)
    ci2 = S.bootstrap_mean_ci(df, "v", "id", n_boot=80)
    assert ci1 == ci2  # hash-seeded: identical across runs
    assert ci1["lo"] < 50.0 < ci1["hi"]
    # CI width ~ 2 * 1.96 * 5/sqrt(3000) ~ 0.72
    assert 0.2 < ci1["hi"] - ci1["lo"] < 1.5
    # replicate weights really are Poisson(1): mean weight ~ 1
    means = [
        r["boot_mean"]
        for r in S.bootstrap_means(df, "v", "id", n_boot=20).collect()
    ]
    assert len(means) == 20 and all(45 < m < 55 for m in means)


def test_prefix_sums_persist_handle_and_release(spark):
    """prefix_sums(persist=True) caches the bucketed input across its
    two downstream scans and hands the cache out via _cached_deps;
    ks_two_sample propagates the handle so callers can release it."""
    from data_quality_checker_spark.operators import drift as DR
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        (F.col("id") % 97).cast("double").alias("v"),
        (F.col("id") % 2 == 0).alias("cur"),
    )
    res = DR.ks_two_sample(df, "v", F.col("cur"))
    row = res.collect()[0]
    assert row["n_baseline"] == 1000 and row["n_current"] == 1000
    # two handles now: the grouped source g (scanned by the quantile
    # probe, the bucketing, AND the totals agg) plus prefix_sums' own
    # bucketed intermediate
    deps = getattr(res, "_cached_deps", ())
    assert len(deps) == 2 and all(d.is_cached for d in deps)
    DR.release_cache(res)
    assert all(not d.is_cached for d in deps)
    # persist=False -> no handle
    g = df.groupBy("v").agg(F.count("*").alias("_c"))
    res2 = DR.prefix_sums(g, "v", ["_c"], persist=False)
    assert getattr(res2, "_cached_deps", ()) == ()


def test_degenerate_column_sets_no_crash(spark):
    """Review regressions: correlation_matrix with 0/1 numeric columns
    returns the well-defined diagonal/empty result, and
    target_feature_boxstats skips cleanly when every requested feature
    is missing (both used to raise agg(*[]) AssertionError)."""
    from data_quality_checker_spark.operators import stats as S

    one = spark.createDataFrame([(1.0, "x")], ["v", "s"])
    rows = S.correlation_matrix(one).collect()
    assert [tuple(r) for r in rows] == [("v", "v", 1.0)]
    assert S.correlation_matrix(one.select("s")).count() == 0
    assert S.target_feature_boxstats(one, "s", ["nope"]).count() == 0
    assert S.target_feature_boxstats(one, "s", []).count() == 0


def test_ks_degenerate_inputs_no_crash(spark):
    """Review regressions: an empty sample side or a constant column
    yields d = NULL with counts visible — not an ANSI DIVIDE_BY_ZERO
    job abort."""
    from data_quality_checker_spark.operators import drift as DR

    df = spark.range(0, 100).select(
        (F.col("id") % 7).cast("double").alias("v")
    )
    r = DR.ks_two_sample(df, "v", F.lit(False)).collect()[0]
    assert r["n_current"] == 0 and r["n_baseline"] == 100
    assert r["d"] is None and r["p_value"] is None
    c = spark.range(0, 10).select(F.lit(5.0).alias("v"))
    r2 = DR.ks_uniformity(c, "v").collect()[0]
    assert r2["n"] == 10 and r2["d"] is None


def test_lsh_and_banding_guards(spark):
    """Review regressions: a dim-mismatched vector fails loudly
    instead of collapsing every row into one LSH bucket (silent n^2
    join); non-divisible banding is rejected up front."""
    import pytest

    from data_quality_checker_spark.operators.dedup import (
        near_duplicates_minhash,
        sign_lsh_key,
    )

    vdf = spark.createDataFrame([(1, [1.0] * 16)], ["id", "v"])
    with pytest.raises(Exception, match="expected 8-dim"):
        vdf.select(sign_lsh_key(F.col("v"), dim=8).alias("k")).collect()
    # matching dim still produces a key
    ok = vdf.select(
        sign_lsh_key(F.col("v"), dim=16).alias("k")
    ).collect()[0]["k"]
    assert len(ok) == 12
    with pytest.raises(ValueError, match="divisible"):
        near_duplicates_minhash(
            vdf.withColumn("text", F.lit("a b c")),
            num_hashes=32,
            num_bands=6,
        )
