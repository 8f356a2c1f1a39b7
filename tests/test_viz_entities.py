"""Tests for the viz-reframe operators (ecdf_table /
correlation_matrix / target_feature_boxstats — the data behind
plot_cdf, plot_correlation_heatmap, target_feature_relationship),
date-granularity inconsistencies, and the heuristic entity/POS
operators."""

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.operators import entities as E
from data_quality_checker_spark.operators import quality as Q
from data_quality_checker_spark.operators import stats as S
from data_quality_checker_spark.operators.drift import release_cache


def test_ecdf_table_exact(spark):
    df = spark.createDataFrame(
        [(1.0,), (1.0,), (2.0,), (3.0,), (None,)], "x double"
    )
    out = S.ecdf_table(df, "x", partitions=2)
    got = {r["value"]: r["cdf"] for r in out.collect()}
    release_cache(out)
    assert got == {1.0: 0.5, 2.0: 0.75, 3.0: 1.0}


def test_correlation_matrix_symmetric_with_diagonal(spark):
    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i)) for i in range(10)],
        "a double, b double, c double",
    )
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in S.correlation_matrix(df).collect()
    }
    assert len(got) == 9
    for c in "abc":
        assert got[(c, c)] == 1.0
    assert got[("a", "b")] == pytest.approx(1.0)
    assert got[("b", "a")] == got[("a", "b")]
    assert got[("a", "c")] == pytest.approx(-1.0)


def test_target_feature_boxstats_quartiles(spark):
    rows = [("g1", float(v)) for v in range(1, 6)] + [("g2", 10.0)]
    df = spark.createDataFrame(rows, "target_col string, v double")
    got = {
        r["target"]: r
        for r in S.target_feature_boxstats(
            df, "target_col", ["v", "missing_col"]
        ).collect()
    }
    g1 = got["g1"]
    assert g1["feature"] == "v" and g1["n"] == 5
    assert (g1["min_v"], g1["q1"], g1["median"], g1["q3"], g1["max_v"]) == (
        1.0, 2.0, 3.0, 4.0, 5.0,
    )
    assert g1["mean"] == 3.0
    assert got["g2"]["median"] == 10.0


def test_date_granularity_minority_rows(spark):
    rows = (
        [(i, "2024-01-%02d" % (i % 28 + 1)) for i in range(8)]
        + [(8, "2024-03"), (9, "2024"), (10, "garbage"), (11, None)]
    )
    df = spark.createDataFrame(rows, "id long, d string")
    got = {
        r["id"]: (r["granularity"], r["modal_granularity"])
        for r in Q.date_granularity_inconsistencies(df, "d").collect()
    }
    assert set(got) == {8, 9, 10}
    assert got[8] == ("month", "day")
    assert got[9] == ("year", "day")
    assert got[10] == ("other", "day")


def test_entity_extraction_runs_and_acronyms(spark):
    df = spark.createDataFrame(
        [
            (0, "we met Acme Corp and NASA near New York City today"),
            (1, "ACME CORP replied; the word Spark alone is skipped"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    ents = {
        (r["id"], r["entity"])
        for r in E.entity_candidates(df).collect()
    }
    # capitalized runs win over their acronym sub-tokens
    assert (0, "Acme Corp") in ents and (1, "ACME CORP") in ents
    assert (0, "NASA") in ents and (0, "New York City") in ents
    assert not any(e == "Spark" for _, e in ents)  # lone TitleCase
    assert not any(e == "ACME" for _, e in ents)

    freq = {
        r["entity"]: (r["n_mentions"], r["n_docs"])
        for r in E.entity_frequencies(df).collect()
    }
    assert freq["Acme Corp"] == (1, 1)

    cons = {
        r["entity_norm"]: r["variants"]
        for r in E.entity_consistency(df).collect()
    }
    assert cons == {"acme corp": "ACME CORP|Acme Corp"}


def test_pos_distribution_classes(spark):
    df = spark.createDataFrame(
        [(0, "the cat quickly jumped over 42 Powerful useful dogs and it")],
        "doc_id long, text string",
    )
    got = {r["pos"]: r["n"] for r in E.pos_distribution(df).collect()}
    assert got["DET"] == 1          # the
    assert got["ADV"] == 1          # quickly
    assert got["VERB"] == 1         # jumped
    assert got["NUM"] == 1          # 42
    assert got["PROPN"] == 1        # Powerful (capitalized)
    assert got["ADJ"] == 1          # useful
    assert got["CCONJ"] == 1        # and
    assert got["PRON"] == 1         # it
    assert got["NOUN"] == 2         # cat, dogs
    total = sum(got.values())
    pcts = {r["pos"]: r["pct"] for r in E.pos_distribution(df).collect()}
    assert pcts["NOUN"] == pytest.approx(2 / total)
