"""Operator tests for quality/joins — including reference-suite parity
(/root/reference/tests/test_checker.py:22-54 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.operators import joins as J
from data_quality_checker_spark.operators import quality as Q


@pytest.fixture(scope="module")
def ref_fixture(spark):
    # the reference's own 5-row fixture (test_checker.py:12-17)
    return spark.createDataFrame(
        [
            (1.0, 1, 1, "Low"),
            (2.0, 1, 200, "Low"),
            (None, 2, 300, "Medium"),
            (4.0, 2, 400, "High"),
            (5.0, 2, 500, "High"),
        ],
        "A double, B long, C long, D string",
    )


def test_missing_values_parity(spark, ref_fixture):
    got = {
        r["column"]: r["missing_pct"]
        for r in Q.missing_values(ref_fixture).collect()
    }
    assert got["A"] == 20.0  # test_checker.py:22-27
    assert got["B"] == 0.0


def test_no_duplicate_columns_parity(spark, ref_fixture):
    assert Q.duplicate_columns(ref_fixture).count() == 0  # :31-36


def test_duplicate_columns_found(spark):
    df = spark.createDataFrame(
        [(1, 1, 2), (3, 3, 4)], "x long, y long, z long"
    )
    rows = Q.duplicate_columns(df).collect()
    assert [(r["col_a"], r["col_b"]) for r in rows] == [("x", "y")]


def test_column_value_duplicates(spark, ref_fixture):
    """column_value_duplicates (dq_checker.py:727-740): values occurring
    more than once, with counts; NULLs group like any value; unique
    values and all-distinct columns yield nothing."""
    got = {
        r["value"]: r["dup_count"]
        for r in Q.column_value_duplicates(ref_fixture, "B").collect()
    }
    assert got == {1: 2, 2: 3}
    dd = {
        r["value"]: r["dup_count"]
        for r in Q.column_value_duplicates(ref_fixture, "D").collect()
    }
    assert dd == {"Low": 2, "High": 2}  # Medium (1x) excluded
    # all-distinct column -> empty result
    assert Q.column_value_duplicates(ref_fixture, "C").count() == 0
    # NULLs count as a duplicated value when repeated
    dfn = spark.createDataFrame(
        [(None,), (None,), (7,)], "v long"
    )
    rows = Q.column_value_duplicates(dfn, "v").collect()
    assert [(r["value"], r["dup_count"]) for r in rows] == [(None, 2)]


def test_zscore_outliers_parity(spark, ref_fixture):
    # C = [1,200,300,400,500] has no |z|>3 outliers (test_checker.py:40-45)
    assert Q.outliers_zscore(ref_fixture, cols=["C"]).count() == 0


def test_imbalance_parity(spark, ref_fixture):
    shares = {
        r["value"]: r["share_pct"]
        for r in Q.class_imbalance(ref_fixture, "D").collect()
    }
    assert abs(shares["Medium"] - 20.0) < 1e-9  # test_checker.py:49-54


def test_range_pattern_email_unexpected(spark):
    df = spark.createDataFrame(
        [
            (1, 5.0, "2024-01-01", "a@b.com", "ok"),
            (2, 50.0, "not-a-date", "bad@", "weird"),
        ],
        "id long, v double, d string, email string, cat string",
    )
    assert Q.numeric_out_of_range(df, {"v": (0, 10)}).count() == 1
    assert Q.invalid_date_formats(df, "d").count() == 1
    assert Q.invalid_emails(df, "email").count() == 1
    assert Q.unexpected_values(df, "cat", ["ok"]).count() == 1
    assert Q.pattern_mismatch(df, "cat", "o").count() == 1  # anchored


def test_dup_rows_precision_nullrows_casing(spark):
    df = spark.createDataFrame(
        [
            (1, 1.234, "Apple"),
            (1, 1.23, "apple"),
            (None, None, None),
            (2, 9.9, "Pear"),
        ],
        "k long, v double, s string",
    )
    assert Q.duplicate_rows(df, ["k"]).count() == 2
    assert Q.numeric_precision_violations(df, "v", 2).count() == 1
    assert Q.null_rows(df).count() == 1
    casing = Q.inconsistent_casing(df, "s").collect()
    assert len(casing) == 1 and casing[0]["lower_value"] == "apple"


def test_sparse_unique_rare(spark):
    df = spark.createDataFrame(
        [(1, None, 0.0, "a"), (1, None, 0.0, "a"), (1, None, 5.0, "b")],
        "c long, e long, z double, g string",
    )
    uniq = {r["column"] for r in Q.unique_value_columns(df).collect()}
    assert "c" in uniq and "g" not in uniq
    sparse = {
        r["column"]: r["status"]
        for r in Q.sparse_and_empty_columns(df, 0.5).collect()
    }
    assert sparse["e"] == "empty" and sparse["z"] == "sparse"
    assert Q.rare_categories(df, "g", 2).collect()[0]["value"] == "b"


def test_cast_failures_and_cross_column(spark):
    df = spark.createDataFrame(
        [("1", "x"), ("2", "y"), ("oops", "z")], "n string, s string"
    )
    failures = {
        r["column"]: r["n_failures"]
        for r in Q.cast_failure_counts(df, {"n": "int"}).collect()
    }
    assert failures["n"] == 1
    df2 = spark.createDataFrame([(1, 2), (5, 3)], "a long, b long")
    assert Q.cross_column_violations(df2, "a < b").count() == 1


def test_fk_coverage_drift_integrity(spark):
    orders = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "oid long, s string"
    )
    items = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (9, 12.0)], "oid long, price double"
    )
    assert J.foreign_key_violations(items, orders, "oid").count() == 1
    assert J.coverage_gaps(items, orders, "oid").count() == 2  # 2,3
    cur = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    ref = spark.createDataFrame([(1, "a"), (2, "B")], "k long, v string")
    assert J.row_level_drift(cur, ref, "k", ["v"]).count() == 1
    integ = J.join_integrity(items, orders, ["oid"])
    flags = {(r["oid"], r["side_missing"]) for r in integ.collect()}
    assert (9, "right_only_missing") in flags
    assert (2, "left_only_missing") in flags


def test_validate_aggregation(spark):
    raw = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "g string, v double"
    )
    claimed = spark.createDataFrame(
        [("a", 3.0), ("b", 4.0)], "g string, v double"
    )
    bad = J.validate_aggregation(claimed, raw, ["g"], "v", "sum")
    assert [r["g"] for r in bad.collect()] == ["b"]
