"""CCNet-style score bucketing (plans/ccnet.py): exact rank form,
approximate boundary form, null handling, and the no-sort plan shape
of the approximate path."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.plans.ccnet import (
    CCNET_LABELS,
    score_buckets,
)


def _mk(spark, n=300, langs=("en", "de", "fr")):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.element_at(
                F.array(*[F.lit(l) for l in langs]),
                (F.col("id") % len(langs) + 1).cast("int"),
            ).alias("lang"),
            # deterministic score, irregular order
            ((F.col("id") * 2654435761) % 1000).cast("double").alias(
                "perplexity"
            ),
        )
    )


def test_exact_terciles_balanced_per_lang(spark):
    df = _mk(spark)
    out = score_buckets(df)
    counts = {
        (r["lang"], r["bucket_label"]): r["n"]
        for r in out.groupBy("lang", "bucket_label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang in ("en", "de", "fr"):
        sizes = [counts[(lang, lab)] for lab in CCNET_LABELS]
        assert max(sizes) - min(sizes) <= 1, sizes  # ntile balance
    # head really is the low-score slice
    agg = (
        out.groupBy("lang", "bucket_label")
        .agg(F.max("perplexity").alias("mx"), F.min("perplexity").alias("mn"))
        .collect()
    )
    by = {(r["lang"], r["bucket_label"]): r for r in agg}
    for lang in ("en", "de", "fr"):
        assert by[(lang, "head")]["mx"] <= by[(lang, "middle")]["mn"]
        assert by[(lang, "middle")]["mx"] <= by[(lang, "tail")]["mn"]


def test_nulls_and_labels(spark):
    df = _mk(spark, 30).withColumn(
        "perplexity",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(
            F.col("perplexity")
        ),
    )
    out = score_buckets(df)
    nulls = out.filter(F.col("perplexity").isNull())
    assert nulls.count() == 6
    assert nulls.filter(F.col("bucket_label").isNotNull()).count() == 0
    with pytest.raises(ValueError):
        score_buckets(df, n_buckets=4)  # labels mismatch
    n2 = score_buckets(df, n_buckets=2, labels=None)
    assert set(
        r["bucket_label"]
        for r in n2.filter(F.col("perplexity").isNotNull())
        .select("bucket_label")
        .distinct()
        .collect()
    ) == {"1", "2"}


def test_null_group_and_single_bucket(spark):
    """Review findings: NULL group_col rows must survive BOTH
    strategies (the approx join is null-safe), and n_buckets=1 must
    assign bucket 1 everywhere on both paths."""
    df = _mk(spark, 60).withColumn(
        "lang",
        F.when(F.col("doc_id") % 4 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    for exact in (True, False):
        out = score_buckets(df, exact=exact)
        assert out.count() == 60, exact
        nulls = out.filter(F.col("lang").isNull())
        assert nulls.count() == 15
        assert (
            nulls.filter(F.col("perplexity_bucket").isNull()).count()
            == 0
        ), exact  # NULL group is a group, not a drop
        one = score_buckets(df, n_buckets=1, labels=None, exact=exact)
        assert (
            one.filter(F.col("perplexity_bucket") == 1).count() == 60
        ), exact


def test_approx_form_no_sort_no_corpus_shuffle(spark):
    """The exact=False path must not sort or window the corpus: one
    aggregate for boundaries, broadcast join back."""
    df = _mk(spark, 3000)
    out = score_buckets(df, exact=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert not re.search(r"\bSort\b", plan.replace("SortAggregate", ""))
    # agreement with the exact form away from boundaries: both forms
    # put the global min in bucket 1 and the global max in bucket n
    exact = {
        r["doc_id"]: r["perplexity_bucket"]
        for r in score_buckets(df).collect()
    }
    approx = {r["doc_id"]: r["perplexity_bucket"] for r in out.collect()}
    mismatch = sum(1 for k in exact if exact[k] != approx[k])
    # boundary drift only — a tiny fraction at relative_error=0.001
    assert mismatch <= len(exact) * 0.02, mismatch
