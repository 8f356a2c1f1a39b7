"""Two-table checks: FK, coverage, drift, join integrity, aggregate
validation (dq_checker.py:243-263, 605-617, 808-873).

All equi-joins — Spark's planner (AQE on) picks broadcast vs sort-merge;
call sites pass ``broadcast_ref=True`` when the reference side is a small
dim so the anti-join never shuffles the fact table."""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "foreign_key_violations",
    "coverage_gaps",
    "row_level_drift",
    "join_integrity",
    "validate_aggregation",
    "snapshot_diff",
]


def foreign_key_violations(
    df: DataFrame,
    ref: DataFrame,
    key: str,
    ref_key: str | None = None,
    broadcast_ref: bool = True,
) -> DataFrame:
    """Rows whose key has no match in the reference column
    (dq_checker.py:605-617) — left_anti join, the distributed ~isin."""
    rk = ref_key or key
    r = ref.select(F.col(rk).alias(key)).distinct()
    if broadcast_ref:
        r = F.broadcast(r)
    return df.join(r, on=key, how="left_anti")


def coverage_gaps(
    df: DataFrame, ref: DataFrame, column: str
) -> DataFrame:
    """Distinct reference values absent from df (dq_checker.py:243-263).
    Returns single column `missing_value`."""
    return (
        ref.select(F.col(column).alias("missing_value"))
        .distinct()
        .join(
            df.select(F.col(column).alias("missing_value")).distinct(),
            on="missing_value",
            how="left_anti",
        )
    )


def row_level_drift(
    cur: DataFrame, ref: DataFrame, key: str, compare: list[str]
) -> DataFrame:
    """Keys present in both whose compared columns differ
    (dq_checker.py:808-821 — the reference's comparison is buggy; this
    implements the documented intent). Returns key + cur_/ref_ pairs."""
    c = cur.select(key, *[F.col(x).alias(f"cur_{x}") for x in compare])
    r = ref.select(key, *[F.col(x).alias(f"ref_{x}") for x in compare])
    joined = c.join(r, on=key, how="inner")
    pred = reduce(
        or_,
        [
            ~F.col(f"cur_{x}").eqNullSafe(F.col(f"ref_{x}"))
            for x in compare
        ],
    )
    return joined.filter(pred)


def join_integrity(
    left: DataFrame, right: DataFrame, keys: list[str]
) -> DataFrame:
    """Full-outer join audit (dq_checker.py:859-873): per key, which side
    is missing and whether the key is duplicated on either side.
    Returns (key..., side_missing, left_rows, right_rows)."""
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("left_rows"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("right_rows"))
    j = lc.join(rc, on=keys, how="full")
    return j.select(
        *keys,
        F.when(F.col("left_rows").isNull(), F.lit("left_only_missing"))
        .when(F.col("right_rows").isNull(), F.lit("right_only_missing"))
        .otherwise(F.lit("both")).alias("side_missing"),
        F.coalesce("left_rows", F.lit(0)).alias("left_rows"),
        F.coalesce("right_rows", F.lit(0)).alias("right_rows"),
    ).filter(
        (F.col("side_missing") != "both")
        | (F.col("left_rows") > 1)
        | (F.col("right_rows") > 1)
    )


def validate_aggregation(
    agg_df: DataFrame,
    raw: DataFrame,
    group_cols: list[str],
    agg_col: str,
    agg_func: str = "sum",
    tol: float = 1e-6,
) -> DataFrame:
    """Re-aggregate raw data and diff against a claimed aggregate table
    (dq_checker.py:823-837). Returns mismatching groups."""
    fn = getattr(F, agg_func)
    recomputed = raw.groupBy(*group_cols).agg(
        fn(agg_col).alias("recomputed")
    )
    return (
        agg_df.select(*group_cols, F.col(agg_col).alias("claimed"))
        .join(recomputed, on=group_cols, how="full")
        .filter(
            F.abs(
                F.coalesce("claimed", F.lit(0.0))
                - F.coalesce("recomputed", F.lit(0.0))
            )
            > tol
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    fingerprint_col: str = "text",
) -> DataFrame:
    """Crawl-snapshot diff (training-data extension; generalizes
    row_level_drift + join_integrity into the workflow that compares
    two crawl dumps): classify every key as added / removed / changed
    / unchanged by md5 fingerprint of ``fingerprint_col``.

    Scale shape: fingerprints are computed BEFORE the join, so the
    full-outer join shuffles (key, 32-hex) pairs — never document
    text; one shuffle per side on the key.

    Precondition: ``key`` is unique within each snapshot (run
    latest-capture dedup first — multiple captures per url would fan
    the join out into conflicting status rows). Same contract as
    dedup_lines_corpus / contamination_report.

    NULL convention: a NULL fingerprint column maps to the sentinel
    ``<NULL>`` (not ``md5('')``), so a document whose text changed
    between NULL and empty string is classified ``changed`` — the same
    NULL-vs-empty distinction dedup_stream's content digest makes."""

    def _fp(c):
        col = F.col(c)
        return F.when(col.isNull(), F.lit("<NULL>")).otherwise(F.md5(col))

    o = old.select(F.col(key), _fp(fingerprint_col).alias("_fo"))
    n = new.select(F.col(key), _fp(fingerprint_col).alias("_fn"))
    j = o.join(n, key, "full")
    return j.select(
        key,
        F.when(F.col("_fo").isNull(), F.lit("added"))
        .when(F.col("_fn").isNull(), F.lit("removed"))
        .when(F.col("_fo") == F.col("_fn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
