"""Learned quality classifier — the trained-model slot of the quality
stack (heuristic rules -> perplexity -> THIS), the DCLM/fastText-
classifier shape: train a document-quality model on labels you trust
(human ratings, LLM judgments, or the rule verdict as weak
supervision) and score the whole corpus distributively.

No reference ancestor — training-data extension. Spark-first split:
featurization is a single pure-Catalyst projection (the same
codegen'd text statistics the rule battery uses — no tokenizer UDF in
the hot path); training is Spark ML LogisticRegression (distributed
L-BFGS over the assembled features, deterministic — no random
initialization); scoring is the fitted model's transform, a
projection over the same features. The fitted PipelineModel
save()/load()s to a path — the artifact contract a spark-submit
deployment ships.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_quality_checker_spark.functions import text as X

__all__ = [
    "QUALITY_FEATURES",
    "with_quality_features",
    "train_quality_model",
    "score_quality",
    "calibration_table",
]

QUALITY_FEATURES = (
    "f_n_chars",
    "f_n_words",
    "f_mean_word_len",
    "f_stopword_ratio",
    "f_symbol_ratio",
    "f_lexical_diversity",
    "f_dup_line_frac",
    "f_mean_line_len",
)


def _feature_exprs(text_col: str) -> dict[str, Column]:
    t = F.col(text_col)
    return {
        "f_n_chars": F.coalesce(F.length(t), F.lit(0)).cast("double"),
        "f_n_words": F.coalesce(X.word_count(t), F.lit(0)).cast("double"),
        "f_mean_word_len": F.coalesce(
            X.mean_word_length(t), F.lit(0.0)
        ),
        "f_stopword_ratio": F.coalesce(X.stopword_ratio(t), F.lit(0.0)),
        "f_symbol_ratio": F.coalesce(X.symbol_ratio(t), F.lit(0.0)),
        "f_lexical_diversity": F.coalesce(
            X.lexical_diversity(t), F.lit(0.0)
        ),
        "f_dup_line_frac": F.coalesce(
            X.dup_line_fraction(t), F.lit(0.0)
        ),
        "f_mean_line_len": F.coalesce(
            X.mean_line_length(t), F.lit(0.0)
        ),
    }


def with_quality_features(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One codegen'd projection adding the QUALITY_FEATURES columns
    (nulls and empty docs fold to 0)."""
    return df.withColumns(_feature_exprs(text_col))


def train_quality_model(
    df: DataFrame,
    label_col: str = "keep",
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit LogisticRegression on the quality features against a
    boolean/0-1 ``label_col``. Pass the rule verdict for weak
    supervision, or curated human/LLM labels for the DCLM-style
    upgrade. Returns a Spark ML PipelineModel (save()/load()-able)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = with_quality_features(df, text_col).withColumn(
        "_label", F.col(label_col).cast("double")
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=list(QUALITY_FEATURES), outputCol="_raw"
            ),
            StandardScaler(
                inputCol="_raw", outputCol="_features", withMean=True
            ),
            LogisticRegression(
                featuresCol="_features",
                labelCol="_label",
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipe.fit(feats)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score documents: adds ``out_col`` = P(label=1 | features).
    Pure transform — featurize projection + the fitted pipeline; no
    shuffle, no Python in the scoring path (Spark ML LR transform is
    JVM-side)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(with_quality_features(df, text_col))
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    ).drop(
        "_raw", "_features", "rawPrediction", "probability", "prediction"
    )


def calibration_table(
    df: DataFrame,
    prob_col: str = "quality_prob",
    label_col: str = "keep",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram data for a scored corpus: one row per
    probability bin with ``(bin, n, mean_prob, frac_positive)`` — the
    standard calibration evidence for a learned quality filter (a
    well-calibrated DCLM-style classifier has mean_prob ~=
    frac_positive per bin; systematic gaps mean the keep threshold
    is not operating at the probability it claims).

    One hash aggregate over ``floor(prob * n_bins)`` (prob == 1.0
    clamps into the last bin); NULL probs/labels are excluded. No
    reference ancestor — training-data extension (the model-quality
    report the reference's generate_report has no model for)."""
    if n_bins < 1:
        raise ValueError("need n_bins >= 1")
    p = F.col(prob_col)
    bin_ = F.least(
        F.floor(p * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.filter(p.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(p).alias("mean_prob"),
            F.avg(F.col(label_col).cast("double")).alias(
                "frac_positive"
            ),
        )
        .orderBy("bin")
    )
