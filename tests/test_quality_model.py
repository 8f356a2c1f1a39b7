"""Learned quality classifier (plans/quality_model.py): weak-label
training recovers the rule verdict, scoring is deterministic, and the
model artifact round-trips through save/load."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.plans import synth
from data_quality_checker_spark.plans.pipeline import (
    PipelineConfig,
    score_pages,
)
from data_quality_checker_spark.plans.quality_model import (
    score_quality,
    train_quality_model,
    with_quality_features,
)


def test_features_projection_no_shuffle(spark):
    docs = spark.createDataFrame(
        [(1, "a decent little document with words"), (2, None)],
        ["id", "text"],
    )
    out = with_quality_features(docs)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["f_n_words"] == 6.0
    assert rows[2]["f_n_chars"] == 0.0  # null folds to 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weak_label_training_recovers_rules(spark, tmp_path_factory):
    pages = synth.pages_df(spark, 600, seed=61)
    scored = score_pages(pages, PipelineConfig()).select(
        "url", "text", "keep"
    )
    train = scored.filter(F.crc32(F.col("url")) % 5 != 0)
    test = scored.filter(F.crc32(F.col("url")) % 5 == 0)
    model = train_quality_model(train, label_col="keep")
    preds = score_quality(test, model).select(
        "keep", "quality_prob"
    ).collect()
    # threshold at 0.5: the learned model should agree with the rule
    # verdict on the large majority of held-out docs
    agree = sum(
        1 for r in preds if (r["quality_prob"] > 0.5) == bool(r["keep"])
    )
    assert agree / len(preds) > 0.85, agree / len(preds)
    # scores are probabilities
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in preds)

    # determinism: retraining gives identical held-out scores
    model2 = train_quality_model(train, label_col="keep")
    a = [round(r["quality_prob"], 9) for r in preds]
    b = [
        round(r["quality_prob"], 9)
        for r in score_quality(test, model2)
        .select("keep", "quality_prob")
        .collect()
    ]
    assert a == b

    # artifact round-trip
    d = str(tmp_path_factory.mktemp("qmodel"))
    model.write().overwrite().save(f"{d}/m")
    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(f"{d}/m")
    c = [
        round(r["quality_prob"], 9)
        for r in score_quality(test, loaded)
        .select("quality_prob")
        .collect()
    ]
    assert a == c


def test_pipeline_quality_model_scoring(spark, tmp_path_factory):
    """run_pipeline(quality_model_path=...) loads the shipped artifact
    and lands quality_prob in the scored output."""
    from data_quality_checker_spark.plans.pipeline import run_pipeline

    d = str(tmp_path_factory.mktemp("qm_pipe"))
    pages = synth.pages_df(spark, 200, seed=67)
    scored = score_pages(pages, PipelineConfig()).select(
        "url", "text", "keep"
    )
    model = train_quality_model(scored, label_col="keep")
    model.write().overwrite().save(f"{d}/model")

    run_pipeline(
        spark,
        pages,
        f"{d}/out",
        PipelineConfig(num_buckets=4),
        quality_model_path=f"{d}/model",
    )
    out = spark.read.parquet(f"{d}/out/scored")
    assert "quality_prob" in out.columns
    row = out.agg(
        F.avg(F.when(F.col("keep"), F.col("quality_prob"))).alias("k"),
        F.avg(F.when(~F.col("keep"), F.col("quality_prob"))).alias("d"),
    ).collect()[0]
    assert row["k"] > row["d"]  # classifier separates the verdicts


def test_calibration_table(spark):
    from data_quality_checker_spark.plans.quality_model import (
        calibration_table,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        # prob spread over [0, 1] incl. an exact 1.0 (clamps to bin 9)
        (F.col("id") % 101).cast("double") / 100.0,
    ).toDF("doc_id", "quality_prob").withColumn(
        "keep", (F.col("doc_id") % 10) < 6
    ).withColumn(
        "quality_prob",
        F.when(F.col("doc_id") % 50 == 0, F.lit(None)).otherwise(
            F.col("quality_prob")
        ),
    )
    out = calibration_table(df)
    rows = out.collect()
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins) and set(bins) <= set(range(10))
    assert sum(r["n"] for r in rows) == df.filter(
        F.col("quality_prob").isNotNull()
    ).count()
    for r in rows:
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0
        # bin 9 also holds the clamped 1.0 probs
        hi = 1.0 + 1e-9 if r["bin"] == 9 else hi
        assert lo - 1e-9 <= r["mean_prob"] <= hi + 1e-9
        assert 0.0 <= r["frac_positive"] <= 1.0
    import pytest

    with pytest.raises(ValueError):
        calibration_table(df, n_bins=0)
