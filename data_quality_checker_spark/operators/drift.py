"""Distribution-drift and uniformity tests (ECDF family).

Re-expresses the reference's sample-bound scipy calls as distributed
plans:

 - detect_data_drift (two-sample Kolmogorov-Smirnov):
   stat_analyzer.py:48-52 — ks_2samp over baseline vs current values.
 - check_uniform_distribution: stat_analyzer.py:255-299 — one-sample KS
   against U[min,max] for numeric columns, chi-squared against the
   uniform expected count for categorical columns.

The KS statistic needs a global ECDF, i.e. exact prefix sums over a
global value ordering. A bare ``Window.orderBy(v)`` moves ALL rows to a
single partition — the classic scale killer — so :func:`prefix_sums`
implements the textbook two-phase distributed scan instead:
range-partition, per-partition totals (one O(partitions)-row collect),
broadcast offsets, stateful cumulative pass per partition. Everything
downstream of the groupBy touches only distinct values, so the shuffled
payload is bounded by value cardinality, not row count.

The asymptotic p-value uses the Kolmogorov series
``Q(lam) = 2 * sum_{j>=1} (-1)^(j-1) exp(-2 j^2 lam^2)`` with the
Stephens small-sample correction ``lam = (sqrt(ne)+0.12+0.11/sqrt(ne))*D``
— the same closed form is evaluated in the DuckDB oracle twin, so the
two engines agree to full float precision.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

__all__ = [
    "prefix_sums",
    "ks_two_sample",
    "ks_uniformity",
    "chi2_uniformity",
    "release_cache",
]

# shared helper (reads the _cached_deps handle this module also sets)
from data_quality_checker_spark.operators.dedup import release_cache  # noqa: E402


def prefix_sums(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    partitions: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Exact global running sums of ``sum_cols`` in ``order_col`` order,
    WITHOUT a single-partition window.

    Two-phase distributed scan: (1) assign each row a DETERMINISTIC
    range-bucket id from literal approxQuantile boundaries (NOT
    repartitionByRange — its sampler is not stable across the two jobs
    below, so offsets computed against one partitioning would be
    applied to another; observed as a nondeterministically wrong KS
    statistic at sf0.1); (2) aggregate per-bucket totals — an
    O(partitions)-row collect — into per-bucket start offsets;
    (3) shuffle whole buckets (hash on the bucket id — any placement of
    complete buckets is correct since cumulative state is keyed by
    bucket), sort within partitions by (bucket, order), and one
    stateful mapInPandas pass adds ``cum_<c>`` columns (double: counts
    stay exact to 2^53). Rows with NULL ``order_col`` must be filtered
    by the caller; ``order_col`` must be numeric (approxQuantile).

    Phases 2 and 3 each scan the bucketed input once, so with
    ``persist`` (default) it is cached across them — the source is
    then scanned once per call instead of twice. The cache handle is
    attached to the result as ``_cached_deps``; call
    :func:`release_cache` once the result is consumed (ks_two_sample /
    ks_uniformity propagate the handle on their one-row outputs). Pass
    ``persist=False`` if the caller already checkpointed ``df``.
    """
    if partitions is None:
        # scale-adaptive bucket count (tuning module, round-7): the
        # old constant 32 was tuned for local mode — on a cluster it
        # would bottleneck the cumulative pass at 32 tasks, and the
        # reverse constant would bury a small input in empty buckets
        from data_quality_checker_spark.tuning import scaled_partitions

        partitions = scaled_partitions(df)
    # deterministic bucket boundaries as an IN-PLAN percentile_approx
    # aggregate riding a broadcast cross join (round-7): the same
    # Greenwald-Khanna sketch df.approxQuantile ran as a separate
    # blocking job at construction time. ANY deterministic
    # non-decreasing boundary set yields identical cumulative sums
    # (buckets only decide placement; offsets adapt), and GK is
    # deterministic, so both consumers of the bucketing below see the
    # same ids even without the persist.
    probs = [i / partitions for i in range(1, partitions)]
    if probs:
        bounds_row = df.agg(
            F.percentile_approx(
                order_col,
                F.array(*[F.lit(p) for p in probs]),
                F.lit(1000),  # = 1 / approxQuantile's 0.001 error
            ).alias("_bounds")
        )
        keyed = df.crossJoin(F.broadcast(bounds_row))
        pid_expr = F.size(
            F.filter(
                F.col("_bounds"),
                lambda b: b.cast("double") <= F.col(order_col),
            )
        )
    else:
        keyed = df
        pid_expr = F.lit(0)
    d = (
        keyed.withColumn("_pid", pid_expr)
        .drop("_bounds")
        .repartition(partitions, "_pid")
        .sortWithinPartitions("_pid", order_col)
    )
    if persist:
        d = d.persist()  # materialized once for both branches below
    from data_quality_checker_spark.tuning import adaptive_coalesce

    # per-bucket start offsets computed LAZILY in the same query
    # (round-7): bucket totals -> exclusive prefix sum over the
    # O(partitions)-row aggregate (a bounded single-partition window,
    # same shape as the repo's other post-aggregation k-row windows)
    # -> broadcast back on _pid. Replaces the construction-time
    # collect + driver loop; the long-integer window sums cast to
    # double are exact below 2^53, so the offsets are bit-identical
    # to the collected form.
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets_df = adaptive_coalesce(
        d.groupBy("_pid").agg(
            *[F.sum(c).alias(f"_t_{c}") for c in sum_cols]
        ),
        df,
    ).select(
        "_pid",
        *[
            F.coalesce(F.sum(f"_t_{c}").over(woff), F.lit(0))
            .cast("double")
            .alias(f"_off_{c}")
            for c in sum_cols
        ],
    )
    dj = d.join(F.broadcast(offsets_df), "_pid")

    # copy the fields: StructType.add would mutate df's cached schema
    out_schema = StructType(
        list(d.schema.fields)
        + [StructField(f"cum_{c}", DoubleType()) for c in sum_cols]
    )
    off_cols = [f"_off_{c}" for c in sum_cols]

    def cumulate(batches):
        import pandas as pd

        state: dict[int, list[float]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pieces = []
            # rows arrive sorted by (_pid, order): iterating groups in
            # ascending pid order preserves the original row order
            for pid, grp in pdf.groupby("_pid", sort=True):
                st = state.setdefault(
                    int(pid),
                    [float(grp[oc].iloc[0]) for oc in off_cols],
                )
                grp = grp.drop(columns=off_cols)
                for i, c in enumerate(sum_cols):
                    vals = grp[c].fillna(0).astype("float64")
                    grp[f"cum_{c}"] = vals.cumsum() + st[i]
                    st[i] += float(vals.sum())
                pieces.append(grp)
            yield pd.concat(pieces)

    out = dj.mapInPandas(cumulate, schema=out_schema).drop("_pid")
    out._cached_deps = (d,) if persist else ()
    return out


def _kolmogorov_p(d: Column, ne: Column, terms: int = 100) -> Column:
    """Asymptotic two-sided KS p-value (Kolmogorov series + Stephens
    correction), as a pure Catalyst expression so the DuckDB twin can
    evaluate the identical formula."""
    lam = (F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)) * d
    series = F.aggregate(
        F.sequence(F.lit(1), F.lit(terms)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.when(j % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.exp(F.lit(-2.0) * (j * j).cast("double") * lam * lam),
    )
    # below lam ~ 0.02 the 100-term alternating tail hasn't decayed and
    # the partial sum oscillates (at lam == 0 it is exactly 0, not the
    # analytic limit 1/2) — there Q(lam) == 1 to >10 decimal places.
    # NULL d or ne (degenerate inputs) must yield a NULL p-value:
    # greatest(NULL, 0.0) is 0.0 in Spark, which would otherwise
    # launder "undefined" into "p = 0, certain drift"
    return F.when(d.isNull() | ne.isNull(), F.lit(None).cast("double")) \
        .when(lam < 0.02, F.lit(1.0)) \
        .otherwise(
            F.least(F.lit(1.0), F.greatest(F.lit(0.0), 2.0 * series))
        )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    in_current: Column,
    partitions: int | None = None,
) -> DataFrame:
    """Two-sample KS drift test (stat_analyzer.py:48-52): baseline =
    rows where ``in_current`` is false, current = rows where true.
    Returns one row (d, n_baseline, n_current, p_value); D is the max
    absolute ECDF gap, exact (not binned)."""
    from data_quality_checker_spark.tuning import adaptive_coalesce

    g = adaptive_coalesce(
        df.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(
            F.sum(F.when(in_current, 1).otherwise(0)).alias("_cur"),
            F.sum(F.when(in_current, 0).otherwise(1)).alias("_base"),
        ),
        df,
    ).persist()  # consumed 3x: quantile probe, bucketing, totals
    cum = prefix_sums(g, value_col, ["_cur", "_base"], partitions)
    totals = g.agg(
        F.sum("_cur").cast("double").alias("_n_cur"),
        F.sum("_base").cast("double").alias("_n_base"),
    )
    agg = cum.crossJoin(F.broadcast(totals)).agg(
        F.max(
            F.abs(
                # nullif: an EMPTY side must yield d = NULL (with
                # the zero count visible), not an ANSI DIVIDE_BY_ZERO
                F.col("cum__cur") / F.nullif(F.col("_n_cur"), F.lit(0.0))
                - F.col("cum__base")
                / F.nullif(F.col("_n_base"), F.lit(0.0))
            )
        ).alias("d"),
        F.first("_n_cur").alias("nc"),
        F.first("_n_base").alias("nb"),
    )
    ne = (
        # nullif BOTH: an empty side makes ne = 0 and the p-value's
        # 0.11/sqrt(ne) term would still divide by zero
        F.nullif(F.col("nc") * F.col("nb"), F.lit(0.0))
        / F.nullif(F.col("nc") + F.col("nb"), F.lit(0.0))
    )
    out = agg.select(
        F.col("d"),
        F.col("nb").cast("bigint").alias("n_baseline"),
        F.col("nc").cast("bigint").alias("n_current"),
        _kolmogorov_p(F.col("d"), ne).alias("p_value"),
    )
    out._cached_deps = (g,) + tuple(getattr(cum, "_cached_deps", ()))
    return out


def ks_uniformity(
    df: DataFrame, value_col: str, partitions: int | None = None
) -> DataFrame:
    """One-sample KS of a numeric column against the uniform
    distribution on [min, max] (stat_analyzer.py:255-299 numeric
    branch: min-max scale, kstest(..., 'uniform')). Returns one row
    (d, n, p_value). D accounts for both ECDF sides at each jump:
    max(ECDF_hi - F(v), F(v) - ECDF_lo)."""
    from data_quality_checker_spark.tuning import adaptive_coalesce

    g = adaptive_coalesce(
        df.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("_cnt")),
        df,
    ).persist()  # consumed 3x: quantile probe, bucketing, totals
    cum = prefix_sums(g, value_col, ["_cnt"], partitions)
    totals = g.agg(
        F.sum("_cnt").cast("double").alias("_n"),
        F.min(value_col).alias("_lo"),
        F.max(value_col).alias("_hi"),
    )
    v = F.col(value_col)
    # nullif: a CONSTANT column (min == max) yields d = NULL — KS
    # against a zero-width uniform is undefined — not a crash
    fv = (v - F.col("_lo")) / F.nullif(
        F.col("_hi") - F.col("_lo"), F.lit(0.0)
    )
    ecdf_hi = F.col("cum__cnt") / F.col("_n")
    ecdf_lo = (F.col("cum__cnt") - F.col("_cnt")) / F.col("_n")
    agg = (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max(F.greatest(ecdf_hi - fv, fv - ecdf_lo)).alias("d"),
            F.first("_n").alias("n"),
        )
    )
    out = agg.select(
        F.col("d"),
        F.col("n").cast("bigint").alias("n"),
        _kolmogorov_p(F.col("d"), F.col("n")).alias("p_value"),
    )
    out._cached_deps = (g,) + tuple(getattr(cum, "_cached_deps", ()))
    return out


def chi2_uniformity(df: DataFrame, col: str) -> DataFrame:
    """Chi-squared goodness-of-fit of a categorical column against the
    uniform expected count n/k (stat_analyzer.py:255-299 categorical
    branch). Returns one row (chi2, dof, n); the p-value needs the
    regularized incomplete gamma, computed driver-side by
    :func:`uniformity_test` when scipy is present."""
    g = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return g.agg(
        (
            # square in DOUBLE: a >3e9-row category would overflow
            # long multiplication under ANSI and abort the job
            F.sum(F.col("_cnt").cast("double") * F.col("_cnt"))
            / (F.sum("_cnt") / F.count(F.lit(1)))
            - F.sum("_cnt")
        ).alias("chi2"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("dof"),
        F.sum("_cnt").cast("bigint").alias("n"),
    )


def uniformity_test(
    df: DataFrame, col: str, numeric: bool, p_threshold: float = 0.05
) -> dict:
    """Dict-shaped twin of the reference API
    (stat_analyzer.py:255-299): {'is_uniform', 'p_value', 'statistic'}."""
    if numeric:
        row = ks_uniformity(df, col).collect()[0]
        return {
            "statistic": row["d"],
            "p_value": row["p_value"],
            "is_uniform": row["p_value"] > p_threshold,
        }
    row = chi2_uniformity(df, col).collect()[0]
    p = float("nan")
    try:
        from scipy import stats as sps

        p = float(sps.chi2.sf(row["chi2"], row["dof"]))
    except ImportError:
        pass
    return {
        "statistic": row["chi2"],
        "p_value": p,
        "is_uniform": (p > p_threshold) if p == p else None,
    }
