"""Coverage for operators not yet exercised elsewhere: sampling bias,
overlapping categories/intervals, mojibake, low variance, seasonal
strength, category interaction, redundant tokens, language distribution,
plus physical-plan assertions (predicate pushdown reaches the scan)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.operators import nlp as N
from data_quality_checker_spark.operators import quality as Q
from data_quality_checker_spark.operators import stats as S
from data_quality_checker_spark.operators import temporal as T


def test_sampling_bias(spark):
    df = spark.createDataFrame(
        [("a",)] * 70 + [("b",)] * 30, "cat string"
    )
    biased = Q.sampling_bias(
        df, "cat", {"a": 0.5, "b": 0.5}, tol=0.05
    ).collect()
    assert {r["value"] for r in biased} == {"a", "b"}
    ok = Q.sampling_bias(df, "cat", {"a": 0.7, "b": 0.3}, tol=0.05)
    assert ok.count() == 0


def test_overlapping_categories(spark):
    df = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("w", "q")], "c1 string, c2 string"
    )
    got = {r["value"] for r in S.overlapping_categories(df, "c1", "c2").collect()}
    assert got == {"y"}


def test_overlapping_intervals(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base, base + dt.timedelta(hours=2)),          # overlaps next
        (base + dt.timedelta(hours=1), base + dt.timedelta(hours=3)),
        (base + dt.timedelta(hours=5), base + dt.timedelta(hours=6)),
    ]
    df = spark.createDataFrame(rows, "start timestamp, end timestamp")
    bad = T.overlapping_intervals(df, "start", "end").collect()
    assert len(bad) == 1 and bad[0]["start"] == base


def test_mojibake_rows(spark):
    df = spark.createDataFrame(
        [("clean text",), ("bad � char",), ("weird Ã© artifact",)],
        "t string",
    )
    assert Q.mojibake_rows(df, "t").count() == 2


def test_low_variance_features(spark):
    df = spark.createDataFrame(
        [(1.0, 100.0), (1.0001, 200.0), (0.9999, 300.0)], "a double, b double"
    )
    rows = S.low_variance_features(df, 0.01).collect()
    assert [r["column"] for r in rows] == ["a"]


def test_seasonal_strength(spark):
    """The reference metric (ts_analyzer.py:130-155) is
    1 - var(y - centered_MA)/var(y): the variance the smooth component
    explains. High for trend-dominated series, ~0 when all variance
    sits inside the window (pure short-period oscillation)."""
    base = dt.datetime(2024, 1, 1)
    trending = [
        (base + dt.timedelta(hours=i), 1.0 * i + (0.2 if i % 2 else -0.2))
        for i in range(40)
    ]
    oscillating = [
        (base + dt.timedelta(hours=i), 10.0 + (5.0 if i % 4 == 0 else -1.0))
        for i in range(40)
    ]
    s_trend = T.seasonal_strength(
        spark.createDataFrame(trending, "ts timestamp, v double"),
        "v", "ts", period=4,
    ).collect()[0]["seasonal_strength"]
    s_osc = T.seasonal_strength(
        spark.createDataFrame(oscillating, "ts timestamp, v double"),
        "v", "ts", period=4,
    ).collect()[0]["seasonal_strength"]
    assert s_trend > 0.95
    assert s_osc < 0.2


def test_category_feature_interaction(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "g string, v double"
    )
    rows = {
        r["category"]: r
        for r in N.category_feature_interaction(df, "g", "v").collect()
    }
    assert rows["a"]["mean"] == 2.0 and rows["a"]["median"] == 2.0
    assert rows["b"]["n"] == 1


def test_redundant_tokens_and_language_distribution(spark):
    df = spark.createDataFrame(
        [(0, "spark spark spark rare", "en"), (1, "spark is here", "es")],
        "doc_id long, text string, lang string",
    )
    red = {r["token"] for r in N.redundant_tokens(df, min_count=4).collect()}
    assert red == {"spark"}
    langs = [
        (r["lang"], r["n"])
        for r in N.language_distribution(df).collect()
    ]
    assert sorted(langs) == [("en", 1), ("es", 1)]


def test_predicate_pushdown_reaches_parquet_scan(spark, tmp_path_factory):
    """The Q1-style date filter must appear in PushedFilters and the
    scan must prune to the referenced columns (SURVEY.md §4.2)."""
    d = str(tmp_path_factory.mktemp("pq"))
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").write.parquet(
        d, mode="overwrite"
    )
    li = spark.read.parquet(d)
    q = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert scan_lines and "l_shipdate" in scan_lines[0]
    read_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_lines
    # only the 3 referenced columns are read, not all 11
    assert "l_extendedprice" not in read_lines[0]
    assert "l_returnflag" in read_lines[0]


def test_report_and_remaining_quality_ops(spark):
    df = spark.createDataFrame(
        [
            (1.0, "a", "p1"),
            (1.0, "a", "p1"),
            (None, "b", "p2"),
            (4.0, "b", None),
        ],
        "v double, c string, part string",
    )
    rep = Q.report(df)
    assert rep["missing_values_pct"]["v"] == 25.0
    assert rep["duplicate_row_count"] == 2
    dups = Q.column_value_duplicates(df, "c").collect()
    assert {(r["value"], r["dup_count"]) for r in dups} == {("a", 2), ("b", 2)}
    comp = Q.partition_column_completeness(df, "part", ["v", "c"]).collect()
    # p2's only row has v NULL -> flagged; c is populated everywhere
    assert [(r["partition"], r["column"]) for r in comp] == [("p2", "v")]
    df2 = spark.createDataFrame(
        [(None, "x", "p1"), (None, "y", "p1"), (1.0, "z", "p2")],
        "v double, c string, part string",
    )
    rows = Q.partition_column_completeness(df2, "part", ["v"]).collect()
    assert [(r["partition"], r["column"]) for r in rows] == [("p1", "v")]
    assert Q.column_naming_violations(
        spark.createDataFrame([(1,)], "BadName long")
    ) == ["BadName"]


def test_partition_column_completeness(spark):
    from data_quality_checker_spark.operators import quality as Q

    rows = [
        ("p1", 1, "x"),
        ("p1", 2, None),
        ("p2", None, None),   # p2: val entirely null, tag entirely null
        ("p2", None, None),
        ("p3", 5, None),      # p3: tag entirely null
    ]
    df = spark.createDataFrame(rows, "part string, val int, tag string")
    got = {
        (r["partition"], r["column"])
        for r in Q.partition_column_completeness(
            df, "part", ["val", "tag"]
        ).collect()
    }
    assert got == {("p2", "val"), ("p2", "tag"), ("p3", "tag")}


def test_column_naming_violations(spark):
    from data_quality_checker_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, 2, 3, 4)], "good_name int, BadName int, `with space` int, ok int"
    )
    assert Q.column_naming_violations(df) == ["BadName", "with space"]
    assert Q.column_naming_violations(df, pattern=r"^\w+$") == ["with space"]


def test_composite_nlp_wrappers(spark):
    from data_quality_checker_spark.operators import nlp as N

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat. the cat sat again! the end?"),
            (1, "the cat sat on the mat. the cat sat again! the start?"),
            (2, "spark engines shuffle data. The data the data the data."),
            (3, None),
        ],
        "doc_id long, text string",
    )
    red = N.analyze_text_redundancy_structure(
        docs, redundancy_threshold=3, ngram_n=3, top_ngrams_k=5
    )
    assert set(red) == {
        "redundant_phrases", "sentence_structure", "common_ngrams",
    }
    toks = {r["token"] for r in red["redundant_phrases"].collect()}
    assert "the" in toks
    assert red["common_ngrams"].count() == 5

    sim = N.analyze_text_similarity(docs, similarity_threshold=0.3)
    pairs = {(r["id_a"], r["id_b"]) for r in sim["similar_text_pairs"].collect()}
    assert (0, 1) in pairs
    assert sim["tfidf_top_terms"].count() > 0

    deep = N.analyze_deep_linguistics(docs)
    langs = {r["lang"]: r["n"] for r in deep["language_distribution"].collect()}
    assert langs.get("en", 0) >= 2
    assert 0 < deep["lexical_diversity"].first()["lexical_diversity"] < 1

    var = N.detect_text_variability(docs, min_count=4)
    assert {r["token"] for r in var["overused_tokens"].collect()} >= {"the"}
    casing = {r["lower_value"] for r in var["casing_variants"].collect()}
    assert casing == set()  # full-text casing collisions: none here

    topics = N.analyze_topics_and_keywords(docs, n_topics=2, top_keywords=3)
    assert topics["topics"].count() == 2 and len(topics["vocabulary"]) > 0
    assert topics["keywords"].first()["token"] == "the"

    overview = N.analyze_text_complexity_overview(docs).collect()
    by_id = {r["doc_id"]: r for r in overview}
    assert len(by_id) == 3  # null doc filtered
    assert by_id[0]["words"] == 12
    assert by_id[0]["mean_sentence_words"] == 4.0


def test_rake_keywords_hand_computed(spark):
    """RAKE on a tiny corpus vs hand-computed degree/frequency scores
    (stopword set reduced to make the arithmetic checkable)."""
    from data_quality_checker_spark.operators import nlp as N

    # stopwords: {the, of, and}. Text yields phrase instances:
    #  "deep learning" x2, "systems", "quality", "data" x1 ... verify
    docs = spark.createDataFrame(
        [
            (0, "deep learning and the quality of deep learning systems"),
            (1, "data, and deep systems!"),
        ],
        "doc_id long, text string",
    )
    sw = ("the", "of", "and")
    phrases = [
        r["phrase"]
        for r in N.rake_phrases(docs, stopwords=sw).collect()
    ]
    assert sorted(phrases) == sorted(
        ["deep learning", "quality", "deep learning systems",
         "data", "deep systems"]
    )
    # word stats over instances:
    # deep: freq 3 (dl, dls, ds), degree 2+3+2=7 -> 7/3
    # learning: freq 2, degree 2+3=5 -> 5/2
    # systems: freq 2, degree 3+2=5 -> 5/2
    # quality: 1/1=1 ; data: 1/1=1
    got = {
        r["phrase"]: r["score"]
        for r in N.rake_keywords(
            docs, top_k=10, stopwords=sw
        ).collect()
    }
    import pytest as _pt

    assert got["deep learning systems"] == _pt.approx(7 / 3 + 5 / 2 + 5 / 2)
    assert got["deep learning"] == _pt.approx(7 / 3 + 5 / 2)
    assert got["deep systems"] == _pt.approx(7 / 3 + 5 / 2)
    assert got["quality"] == _pt.approx(1.0)
    assert got["data"] == _pt.approx(1.0)


def test_sentiment_scores_buckets(spark):
    from data_quality_checker_spark.operators import nlp as N

    docs = spark.createDataFrame(
        [
            (0, "this is a great and wonderful thing, i love it"),
            (1, "terrible awful broken useless junk"),
            (2, "good but also bad"),
            (3, "nothing polar here at all"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in N.sentiment_scores(docs).collect()}
    assert got[0]["tone"] == "positive" and got[0]["polarity"] == 1.0
    assert got[1]["tone"] == "negative" and got[1]["polarity"] == -1.0
    assert got[2]["tone"] == "neutral" and got[2]["polarity"] == 0.0
    assert got[3]["polarity"] is None and got[3]["tone"] is None
    assert 4 not in got  # null text filtered


def test_subjectivity_axis_and_emotional_tone(spark):
    from data_quality_checker_spark.operators import nlp as N

    docs = spark.createDataFrame(
        [
            (0, "i think this is really great and i definitely love it"),
            (1, "the train departs at noon from platform four"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in N.sentiment_scores(docs).collect()}
    # doc 0: think/really/definitely + great/love -> strongly subjective
    assert got[0]["subj_hits"] >= 3
    assert got[0]["subjectivity"] > 0.3
    assert got[0]["subjectivity_label"] == "subjective"
    # doc 1: plain factual text -> no markers
    assert got[1]["subj_hits"] == 0 and got[1]["subjectivity"] == 0.0
    assert got[1]["subjectivity_label"] == "objective"
    tone = {r["doc_id"]: r for r in N.analyze_emotional_tone(docs).collect()}
    assert set(tone[0].asDict()) == {
        "doc_id", "polarity", "tone", "subjectivity", "subjectivity_label"
    }
    assert tone[0]["tone"] == "positive"
    assert tone[0]["subjectivity"] == got[0]["subjectivity"]


def test_phone_validity_predicate(spark):
    from data_quality_checker_spark.operators import quality as Q

    rows = [
        (0, "+1 (415) 555-0123"),   # valid NANP via +1
        (1, "+44 20 7946 0958"),    # valid UK, 10 national
        (2, "+44 20 79"),           # too short for UK
        (3, "+999 12345678"),       # unknown country code
        (4, "415-555-0123"),        # bare NANP, no +
        (5, "hello world"),
        (6, None),
        (7, "+971 4 123 4567"),     # 3-digit cc (UAE), 8 national
    ]
    df = spark.createDataFrame(rows, "id long, phone string")
    strict = {r["id"]: r for r in Q.phone_validity(df).collect()}
    assert strict[0]["phone_valid"] and strict[0]["phone_cc"] == "1"
    assert strict[1]["phone_valid"] and strict[1]["phone_cc"] == "44"
    assert not strict[2]["phone_valid"]
    assert not strict[3]["phone_valid"] and strict[3]["phone_cc"] is None
    assert not strict[4]["phone_valid"]  # strict E.164 needs the +
    assert not strict[5]["phone_valid"] and not strict[6]["phone_valid"]
    assert strict[7]["phone_valid"] and strict[7]["phone_cc"] == "971"
    # default_region US accepts bare 10-digit NANP
    us = {r["id"]: r for r in Q.phone_validity(df, default_region="US").collect()}
    assert us[4]["phone_valid"] and us[4]["phone_cc"] == "1"
    assert not us[5]["phone_valid"]
    # zero-shuffle claim: broadcast joins only, no Exchange in the plan
    plan = (
        Q.phone_validity(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re
    assert not re.search(r"Exchange (hash|range)partitioning", plan), plan
