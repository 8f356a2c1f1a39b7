"""Unit tests for functions/text.py against hand-computed expectations,
plus a row-for-row property check vs the pure-Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.functions import text as T

DOCS = [
    (0, "the cat and the dog"),            # 5 tokens, 4 distinct
    (1, "a a a a"),                         # heavy repetition
    (2, "Hello, World!!"),                  # symbols
    (3, ""),                                # empty
    (4, "one\ntwo\ntwo\nthree"),            # dup line
    (5, "el la los un de en es y o que"),   # spanish stopwords
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["id", "text"])


def _get(spark, col, idx):
    rows = (
        _df(spark).select("id", col.alias("v")).orderBy("id").collect()
    )
    return rows[idx]["v"]


def test_word_count(spark):
    assert _get(spark, T.word_count("text"), 0) == 5
    assert _get(spark, T.word_count("text"), 3) == 0


def test_lexical_diversity_and_repetition(spark):
    assert _get(spark, T.lexical_diversity("text"), 0) == 4 / 5
    assert _get(spark, T.repetition_ratio("text"), 1) == 0.75
    assert _get(spark, T.lexical_diversity("text"), 3) is None


def test_stopword_ratio(spark):
    # "the ... and the ..." -> 3 stopword tokens of 5
    assert _get(spark, T.stopword_ratio("text"), 0) == 3 / 5


def test_symbol_ratio(spark):
    # "Hello, World!!" = 14 chars, 3 symbols (, ! !)
    assert abs(_get(spark, T.symbol_ratio("text"), 2) - 3 / 14) < 1e-12


def test_mean_word_length(spark):
    # the(3) cat(3) and(3) the(3) dog(3) -> 3.0
    assert _get(spark, T.mean_word_length("text"), 0) == 3.0


def test_line_stats(spark):
    assert _get(spark, T.line_count("text"), 4) == 4
    assert _get(spark, T.dup_line_fraction("text"), 4) == 0.25
    assert _get(spark, T.mean_line_length("text"), 4) == (3 + 3 + 3 + 5) / 4


def test_langid(spark):
    assert _get(spark, T.langid_best("text"), 0) == "en"
    assert _get(spark, T.langid_best("text"), 5) == "es"
    assert _get(spark, T.langid_best("text"), 3) == "und"


def test_token_count_regex(spark):
    assert _get(spark, T.token_count_regex("text"), 2) == 2


def test_fingerprint_matches_python(spark):
    def fp(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % 2147483647
        return acc

    got = [
        (r["id"], r["v"])
        for r in _df(spark)
        .select("id", T.doc_fingerprint("text").alias("v"))
        .orderBy("id")
        .collect()
    ]
    for i, v in got:
        assert v == fp(DOCS[i][1]), f"doc {i}"


def test_word_ngrams(spark):
    df = _df(spark).select(
        "id", T.word_ngrams(T.tokens("text"), 2).alias("g")
    )
    rows = {r["id"]: r["g"] for r in df.collect()}
    assert rows[0] == ["the cat", "cat and", "and the", "the dog"]
    assert rows[3] == []


def test_normalize_punctuation_matches_python(spark):
    from data_quality_checker_spark.functions.text import (
        normalize_punctuation,
        normalize_punctuation_python,
    )

    rows = [
        (1, "‘curly’ “quotes” – and — dashes − minus nbsp … end"),
        (2, None),
        (3, "plain ascii stays"),
        (4, "´acute‚ low„ double"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r["id"]: r["s"]
        for r in df.select(
            "id", normalize_punctuation("text").alias("s")
        ).collect()
    }
    for i, t in rows:
        assert got[i] == normalize_punctuation_python(t), i
    assert got[1] == "'curly' \"quotes\" - and - dashes - minus nbsp ... end"
    assert got[2] is None
    assert got[3] == "plain ascii stays"
