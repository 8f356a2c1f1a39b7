"""Row/column data-quality checks — the DataQualityChecker surface
(/root/reference/dataset_quality_checker/dq_checker.py) rebuilt as pure
DataFrame functions.

Scale notes:
 - every "report" style check is a single multi-aggregate job (one scan),
   where the reference runs one full pandas pass per check;
 - per-column loops build *expressions*, not jobs — k columns cost one
   shuffle-free scan, not k;
 - duplicate-column detection replaces the reference's transpose
   (dq_checker.py:572 — O(rows*cols) copy) with per-column xxhash64
   fingerprint aggregates (one scan, k tiny results).
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as SqlT

__all__ = [
    "missing_values",
    "date_granularity_inconsistencies",
    "numeric_out_of_range",
    "pattern_mismatch",
    "invalid_emails",
    "unexpected_values",
    "string_length_outliers",
    "invalid_date_formats",
    "null_rows",
    "numeric_precision_violations",
    "duplicate_rows",
    "duplicate_rows_in_subset",
    "duplicate_columns",
    "column_value_duplicates",
    "unique_value_columns",
    "sparse_and_empty_columns",
    "class_imbalance",
    "rare_categories",
    "null_proportions_by_group",
    "partition_column_completeness",
    "inconsistent_casing",
    "sampling_bias",
    "outliers_zscore",
    "outliers_iqr",
    "cross_column_violations",
    "mojibake_rows",
    "cast_failure_counts",
    "column_naming_violations",
    "phone_validity",
    "E164_CODES",
    "report",
]

# (country code, min national digits, max national digits) for the
# major public E.164 numbering plans (ITU facts; total cc+national
# <= 15 by the standard). E.164 country codes are PREFIX-FREE by ITU
# design — at most one of a number's 1/2/3-digit prefixes is a code —
# which is what lets phone_validity resolve the code with three
# broadcast left-joins instead of a longest-prefix aggregation.
E164_CODES: tuple[tuple[str, int, int], ...] = (
    ("1", 10, 10), ("7", 10, 10),
    ("20", 8, 9), ("27", 9, 9), ("30", 10, 10), ("31", 9, 9),
    ("33", 9, 9), ("34", 9, 9), ("39", 8, 11), ("41", 9, 9),
    ("44", 9, 10), ("46", 7, 9), ("48", 9, 9), ("49", 6, 11),
    ("52", 10, 10), ("55", 10, 11), ("61", 9, 9), ("81", 9, 10),
    ("82", 8, 10), ("86", 10, 11), ("90", 10, 10), ("91", 10, 10),
    ("971", 8, 9), ("972", 8, 9),
)


def _numeric_cols(df: DataFrame, cols: list[str] | None = None) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, SqlT.NumericType)
        and (cols is None or f.name in cols)
    ]


def missing_values(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """% null per column in ONE pass (dq_checker.py:291-304).

    Returns (column string, missing_pct double)."""
    cols = cols or df.columns
    agg = df.agg(
        *[
            (F.avg(F.col(c).isNull().cast("double")) * 100).alias(c)
            for c in cols
        ]
    )
    # unpivot the 1-row wide result into (column, missing_pct)
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).alias("missing_pct"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.column", "s.missing_pct")


def numeric_out_of_range(
    df: DataFrame, ranges: dict[str, tuple[float, float]]
) -> DataFrame:
    """Rows where any column falls outside its (min,max)
    (dq_checker.py:47-79)."""
    pred = reduce(
        or_,
        [
            (F.col(c) < lo) | (F.col(c) > hi)
            for c, (lo, hi) in ranges.items()
        ],
    )
    return df.filter(pred)


def pattern_mismatch(df: DataFrame, column: str, pattern: str) -> DataFrame:
    """Rows whose value does not match an (anchored) regex.

    pandas ``.str.match`` anchors at the start (dq_checker.py:199-220);
    Spark rlike is unanchored, so we anchor explicitly."""
    anchored = pattern if pattern.startswith("^") else f"^(?:{pattern})"
    return df.filter(
        F.col(column).isNotNull() & ~F.col(column).cast("string").rlike(anchored)
    )


# email regex lifted verbatim from dq_checker.py:132 (already anchored)
EMAIL_REGEX = r"^[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+$"


def invalid_emails(df: DataFrame, column: str) -> DataFrame:
    """Rows with invalid email syntax (dq_checker.py:122-133)."""
    return df.filter(
        F.col(column).isNull() | ~F.col(column).rlike(EMAIL_REGEX)
    )


def unexpected_values(
    df: DataFrame, column: str, expected: list
) -> DataFrame:
    """Rows with values outside an allowlist (dq_checker.py:222-241,
    validate_categorical_consistency dq_checker.py:698-710). NULL is
    outside any allowlist (coalesce: ~isin(NULL) is NULL and a bare
    filter would silently treat NULL as expected — the pandas
    reference's ~isin flags NaN)."""
    return df.filter(
        F.coalesce(~F.col(column).isin(expected), F.lit(True))
    )


def string_length_outliers(
    df: DataFrame, column: str, min_len: int, max_len: int
) -> DataFrame:
    """(dq_checker.py:619-634; nlp_analyzer.py:87-88 check_text_length)"""
    ln = F.length(F.col(column))
    return df.filter((ln < min_len) | (ln > max_len))


def invalid_date_formats(
    df: DataFrame, column: str, fmt: str = "yyyy-MM-dd"
) -> DataFrame:
    """Rows failing a strict date parse (dq_checker.py:649-663) —
    try_to_date returns NULL on failure, the NaT semantics of
    pd.to_datetime(errors='coerce') (plain to_date throws under ANSI)."""
    return df.filter(
        F.col(column).isNotNull()
        & F.try_to_date(F.col(column).cast("string"), fmt).isNull()
    )


def null_rows(df: DataFrame) -> DataFrame:
    """Rows where every column is null (dq_checker.py:780-788)."""
    return df.filter(reduce(and_, [F.col(c).isNull() for c in df.columns]))


def numeric_precision_violations(
    df: DataFrame, column: str, max_decimal_places: int
) -> DataFrame:
    """Rows with more decimal places than allowed (dq_checker.py:761-778)
    — expressed as a rounding fixed-point test, no string splitting."""
    c = F.col(column)
    return df.filter(
        c.isNotNull() & (c != F.round(c, max_decimal_places))
    )


def duplicate_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Full-row (or subset) duplicate rows, keep=False semantics
    (dq_checker.py:559-577, 985-998): every member of a duplicated group."""
    keys = subset or df.columns
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_grp_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_grp_n") > 1)
        .drop("_grp_n")
    )


# alias with the reference's subset name
duplicate_rows_in_subset = duplicate_rows


def duplicate_columns(df: DataFrame, sample_rows: int | None = None) -> DataFrame:
    """Pairs of columns with identical contents (dq_checker.py:559-577).

    Never transposes: computes an order-insensitive per-column fingerprint
    sum(xxhash64(value-as-string)) + null count + count in ONE scan, then
    compares the k fingerprints driver-side (k is tiny; rows are not).
    Note: order-insensitive fingerprints are a superset test; exact
    equality additionally needs positional agreement, which callers can
    verify with a follow-up ``sum((a<=>b)::int)==count`` scan.

    ``sample_rows`` bounds the scan to the first N rows (a cheap
    screen for very wide frames; pairs found on a sample still need
    the full-scan confirmation above). It was previously accepted and
    silently ignored (review finding).
    """
    if sample_rows is not None:
        df = df.limit(sample_rows)
    cols = df.columns
    agg = df.agg(
        *[
            # decimal(38,0) sum: overflow-free under ANSI mode at any scale
            F.sum(
                F.xxhash64(F.col(c).cast("string")).cast("decimal(38,0)")
            ).alias(f"h_{c}")
            for c in cols
        ],
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_{c}")
            for c in cols
        ],
    )
    row = agg.collect()[0]
    pairs = [
        (a, b)
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
        if row[f"h_{a}"] == row[f"h_{b}"] and row[f"n_{a}"] == row[f"n_{b}"]
    ]
    spark = df.sparkSession
    schema = "col_a string, col_b string"
    if not pairs:
        return spark.createDataFrame([], schema)
    # positional verification pass for the surviving candidate pairs
    verify = df.agg(
        *[
            F.sum(
                (~F.col(a).eqNullSafe(F.col(b))).cast("long")
            ).alias(f"d_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    ).collect()[0]
    confirmed = [
        pairs[i] for i in range(len(pairs)) if verify[f"d_{i}"] == 0
    ]
    return spark.createDataFrame(confirmed or [], schema)


def column_value_duplicates(df: DataFrame, column: str) -> DataFrame:
    """Values occurring more than once in a column (dq_checker.py:727-740).
    Returns (value, dup_count)."""
    return (
        df.groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def unique_value_columns(df: DataFrame) -> DataFrame:
    """Columns with exactly one distinct non-null value
    (dq_checker.py:417-430). One scan, all columns."""
    agg = df.agg(
        *[F.countDistinct(F.col(c)).alias(c) for c in df.columns]
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"), F.col(c).alias("n_distinct")
                    )
                    for c in df.columns
                ]
            )
        ).alias("s")
    ).select("s.column", "s.n_distinct")
    return stacked.filter(F.col("n_distinct") == 1)


def sparse_and_empty_columns(
    df: DataFrame, sparse_threshold: float = 0.95
) -> DataFrame:
    """Columns entirely null, or null-or-zero fraction above threshold
    (dq_checker.py:579-603). Returns (column, null_frac, null_or_zero_frac,
    status)."""
    num = set(_numeric_cols(df))
    exprs = []
    for c in df.columns:
        nullf = F.avg(F.col(c).isNull().cast("double")).alias(f"nf_{c}")
        if c in num:
            nz = F.avg(
                (F.col(c).isNull() | (F.col(c) == 0)).cast("double")
            ).alias(f"zf_{c}")
        else:
            nz = F.avg(F.col(c).isNull().cast("double")).alias(f"zf_{c}")
        exprs += [nullf, nz]
    agg = df.agg(*exprs)
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"nf_{c}").alias("null_frac"),
                        F.col(f"zf_{c}").alias("null_or_zero_frac"),
                    )
                    for c in df.columns
                ]
            )
        ).alias("s")
    ).select("s.*")
    return stacked.withColumn(
        "status",
        F.when(F.col("null_frac") >= 1.0, F.lit("empty"))
        .when(
            F.col("null_or_zero_frac") > sparse_threshold, F.lit("sparse")
        )
        .otherwise(F.lit("ok")),
    ).filter(F.col("status") != "ok")


def class_imbalance(df: DataFrame, column: str) -> DataFrame:
    """Normalized class shares (dq_checker.py:379-396): (value, share_pct)."""
    counts = df.groupBy(F.col(column).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy()
    return counts.select(
        "value",
        (F.col("n") * 100.0 / F.sum("n").over(total)).alias("share_pct"),
    )


def rare_categories(
    df: DataFrame, column: str, min_count: int
) -> DataFrame:
    """Categories rarer than min_count (dq_checker.py:456-474,
    detect_multiclass_imbalance dq_checker.py:920-934 for share variant)."""
    return (
        df.groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < min_count)
    )


def null_proportions_by_group(
    df: DataFrame, group_col: str, target_col: str
) -> DataFrame:
    """Null rate of target per group (dq_checker.py:969-983) — the
    ancestor of per-partition rule drop-rate metrics."""
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.avg(F.col(target_col).isNull().cast("double")).alias("null_frac")
    )


def partition_column_completeness(
    df: DataFrame, partition_col: str, required: list[str]
) -> DataFrame:
    """Per partition: required columns that are entirely null
    (dq_checker.py:790-806). Returns (partition, column)."""
    agg = df.groupBy(F.col(partition_col).alias("partition")).agg(
        *[F.count(F.col(c)).alias(c) for c in required]
    )
    return (
        agg.select(
            "partition",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"), F.col(c).alias("nn")
                        )
                        for c in required
                    ]
                )
            ).alias("s"),
        )
        .filter(F.col("s.nn") == 0)
        .select("partition", "s.column")
    )


def inconsistent_casing(df: DataFrame, column: str) -> DataFrame:
    """Lowercase forms with >1 distinct original casing
    (dq_checker.py:936-950). Returns (lower_value, n_variants)."""
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(F.lower(F.col(column)).alias("lower_value"))
        .agg(F.countDistinct(F.col(column)).alias("n_variants"))
        .filter(F.col("n_variants") > 1)
    )


def sampling_bias(
    df: DataFrame, column: str, baseline: dict[str, float], tol: float = 0.05
) -> DataFrame:
    """Observed share vs expected share per category
    (dq_checker.py:518-541). Returns rows where |obs-exp| > tol."""
    spark = df.sparkSession
    base = spark.createDataFrame(
        [(k, float(v)) for k, v in baseline.items()],
        "value string, expected_share double",
    )
    shares = class_imbalance(df, column).withColumn(
        "share", F.col("share_pct") / 100.0
    )
    return (
        shares.join(F.broadcast(base), "value", "full")
        .select(
            "value",
            F.coalesce("share", F.lit(0.0)).alias("observed_share"),
            F.coalesce("expected_share", F.lit(0.0)).alias("expected_share"),
        )
        .filter(
            F.abs(F.col("observed_share") - F.col("expected_share")) > tol
        )
    )


def outliers_zscore(
    df: DataFrame, cols: list[str] | None = None, threshold: float = 3.0
) -> DataFrame:
    """Rows where any numeric column has |z| > threshold
    (dq_checker.py:306-377 method='zscore'). Two jobs total: one tiny
    aggregate for (mean, std), one filter scan — not 2 jobs *per column*.
    """
    cols = _numeric_cols(df, cols)
    stats = df.agg(
        *[F.avg(c).alias(f"m_{c}") for c in cols],
        *[F.stddev_pop(c).alias(f"s_{c}") for c in cols],
    ).collect()[0]
    preds = []
    for c in cols:
        m, s = stats[f"m_{c}"], stats[f"s_{c}"]
        if s is None or s == 0:
            continue
        preds.append(F.abs((F.col(c) - F.lit(m)) / F.lit(s)) > threshold)
    if not preds:
        return df.limit(0)
    return df.filter(reduce(or_, preds))


def outliers_iqr(
    df: DataFrame, cols: list[str] | None = None, k: float = 1.5
) -> DataFrame:
    """IQR-fence outliers (dq_checker.py:306-377 method='iqr') using
    exact percentiles (sf-scale) — switch to approx_percentile at the
    100 TB tier via the `approx` flag on call sites."""
    cols = _numeric_cols(df, cols)
    qs = df.agg(
        *[
            F.expr(f"percentile({c}, array(0.25, 0.75))").alias(c)
            for c in cols
        ]
    ).collect()[0]
    preds = []
    for c in cols:
        if qs[c] is None:
            continue
        q1, q3 = qs[c]
        iqr = q3 - q1
        preds.append(
            (F.col(c) < q1 - k * iqr) | (F.col(c) > q3 + k * iqr)
        )
    if not preds:
        return df.limit(0)
    return df.filter(reduce(or_, preds))


def cross_column_violations(df: DataFrame, rule_sql: str) -> DataFrame:
    """Rows violating a cross-column rule given as a SQL boolean
    expression (dq_checker.py:156-176, 742-759, 901-918). The reference
    takes Python callables applied per row; we take Catalyst-optimizable
    SQL strings (pandas_udf escape hatch lives in plans/udfs.py)."""
    return df.filter(~F.expr(rule_sql))


def mojibake_rows(df: DataFrame, column: str) -> DataFrame:
    """Encoding-damage heuristic (reframes dq_checker.py:543-557: Spark
    strings are always valid UTF-8, so detect replacement chars /
    mojibake artifacts instead)."""
    return df.filter(
        F.col(column).rlike("�|Ã.|â€")
    )


def cast_failure_counts(
    df: DataFrame, casts: dict[str, str]
) -> DataFrame:
    """Per column: values that fail a cast to the declared type
    (reframes mixed-Python-type detection dq_checker.py:398-415, 636-647,
    839-857 under a fixed schema). Returns (column, n_failures)."""
    agg = df.agg(
        *[
            F.sum(
                (
                    F.col(c).isNotNull()
                    & F.col(c).cast("string").try_cast(t).isNull()
                ).cast("long")
            ).alias(c)
            for c, t in casts.items()
        ]
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).alias("n_failures"),
                    )
                    for c in casts
                ]
            )
        ).alias("s")
    ).select("s.*")


def column_naming_violations(
    df: DataFrame, pattern: str = "^[a-z_]+$"
) -> list[str]:
    """Driver-side: column names violating a convention
    (dq_checker.py:476-494)."""
    import re

    rx = re.compile(pattern)
    return [c for c in df.columns if not rx.match(c)]


def report(df: DataFrame) -> dict:
    """Composite report (dq_checker.py:33-45): missing % + duplicate rows
    + z-outlier counts, computed in as few jobs as Catalyst allows."""
    missing = {
        r["column"]: r["missing_pct"] for r in missing_values(df).collect()
    }
    dup_count = duplicate_rows(df).count()
    outlier_count = outliers_zscore(df).count()
    return {
        "missing_values_pct": missing,
        "duplicate_row_count": dup_count,
        "zscore_outlier_row_count": outlier_count,
    }


def validate_schema(df: DataFrame, schema_json: dict) -> dict:
    """Declarative schema check (dq_checker.py:432-454 +
    check_data_completeness dq_checker.py:712-725): required columns
    missing from the frame, unexpected extras, and dtype mismatches —
    driver-side against df.schema, no job launched."""
    want = {
        c["name"]: c.get("type") for c in schema_json.get("columns", [])
    }
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = sorted(set(want) - set(have))
    extra = sorted(set(have) - set(want))
    mismatched = sorted(
        name
        for name, typ in want.items()
        if typ is not None and name in have and have[name] != typ
    )
    return {
        "missing_columns": missing,
        "unexpected_columns": extra,
        "type_mismatches": mismatched,
        "valid": not missing and not mismatched,
    }


def phone_validity(
    df: DataFrame, col: str = "phone", default_region: str | None = None
) -> DataFrame:
    """Region-aware E.164 phone validity (check_phone_number_validity,
    dq_checker.py:135-154 — the reference calls the phonenumbers lib,
    absent here by design; this is the numbering-plan subset that is
    public ITU fact: valid country code + national length in range).

    Adds three columns: ``phone_e164`` (digits, normalized, NULL if
    not +-prefixed E.164 shape), ``phone_cc`` (matched country code)
    and ``phone_valid``. The code table is a broadcast dim; because
    E.164 codes are prefix-free, the 1/2/3-digit prefixes are matched
    with three broadcast LEFT joins (zero shuffle) and coalesced —
    never a longest-prefix window.

    ``default_region="US"`` additionally accepts bare 10-digit NANP
    numbers (area code 2-9xx) without the + prefix."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        list(E164_CODES), "cc string, nmin int, nmax int"
    )
    digits = F.regexp_replace(F.col(col), r"[\s().\-]", "")
    out = df.withColumn(
        "phone_e164",
        F.when(
            digits.rlike(r"^\+[0-9]{8,15}$"), F.substring(digits, 2, 15)
        ),
    )
    for n in (1, 2, 3):
        d_n = dim.filter(F.length("cc") == n).withColumnsRenamed(
            {"cc": f"_cc{n}", "nmin": f"_mn{n}", "nmax": f"_mx{n}"}
        )
        out = out.join(
            F.broadcast(d_n),
            F.substring(F.col("phone_e164"), 1, n) == F.col(f"_cc{n}"),
            "left",
        )
    cc = F.coalesce("_cc3", "_cc2", "_cc1")
    nmin = F.coalesce("_mn3", "_mn2", "_mn1")
    nmax = F.coalesce("_mx3", "_mx2", "_mx1")
    nat_len = F.length("phone_e164") - F.length(cc)
    valid = (
        F.col("phone_e164").isNotNull()
        & cc.isNotNull()
        & (nat_len >= nmin)
        & (nat_len <= nmax)
    )
    if default_region == "US":
        nanp = digits.rlike(r"^[2-9][0-9]{9}$")
        valid = valid | nanp
        cc = F.when(nanp & F.col("phone_e164").isNull(), F.lit("1")).otherwise(cc)
    return (
        out.withColumn("phone_cc", cc)
        .withColumn("phone_valid", F.coalesce(valid, F.lit(False)))
        .drop(*[f"_{p}{n}" for p in ("cc", "mn", "mx") for n in (1, 2, 3)])
    )


GRANULARITY_PATTERNS = (
    ("year", r"^[0-9]{4}$"),
    ("month", r"^[0-9]{4}-[0-9]{2}$"),
    ("day", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("timestamp",
     r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}(:[0-9]{2}(\.[0-9]+)?)?$"),
)


def date_granularity_expr(col):
    """CASE expression classifying a raw date STRING's granularity
    (year / month / day / timestamp / other)."""
    expr = None
    trimmed = F.trim(col)
    for name, pat in GRANULARITY_PATTERNS:
        cond = trimmed.rlike(pat)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return expr.otherwise(F.lit("other"))


def date_granularity_inconsistencies(
    df: DataFrame, column: str
) -> DataFrame:
    """Rows whose raw date-string granularity differs from the corpus
    mode — detect_date_granularity_inconsistencies
    (dq_checker.py:952-967). The reference normalizes through
    pd.to_datetime + strftime('%Y-%m-%d') first, which makes every
    surviving value 3-part and the check vacuous (dead logic, noted in
    SURVEY §2); this implements the documented INTENT over the raw
    strings: classify granularity by shape, find the modal class with
    one tiny aggregate (count desc, name asc tie-break — deterministic),
    broadcast the 1-row mode, and return the minority rows. Two
    scans of a projection, one O(#classes) aggregate; no row-count
    shuffle."""
    classified = df.filter(F.col(column).isNotNull()).withColumn(
        "granularity", date_granularity_expr(F.col(column))
    )
    mode = (
        classified.groupBy("granularity")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("granularity"))
        .limit(1)
        .select(F.col("granularity").alias("modal_granularity"))
    )
    return classified.crossJoin(F.broadcast(mode)).filter(
        F.col("granularity") != F.col("modal_granularity")
    )
