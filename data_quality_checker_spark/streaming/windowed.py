"""Event-time windowed aggregation with watermarking — the late-data
handling surface of Structured Streaming (task brief: "watermarks +
windowed aggs for late data"; the reference has no streaming at all,
SURVEY.md §2.12).

Semantics: tumbling event-time windows keyed by (window, key); the
watermark bounds state — windows older than (max event time seen -
watermark) are finalized and emitted (append mode), and events arriving
later than the watermark for an already-finalized window are DROPPED,
which is the correctness contract the metrics pipeline needs (counts
never silently change after emission)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """(window_start, window_end, key, n, mean_value) per finalized
    tumbling window. Works on both streaming and batch frames (batch
    ignores the watermark, which is the standard parity contract).
    ``value_col=None`` skips the mean for value-less event frames
    (the column was previously hardcoded — review finding)."""
    mean = (
        F.avg(value_col)
        if value_col is not None
        else F.lit(None).cast("double")
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            mean.alias("mean_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "n",
            "mean_value",
        )
    )


def windowed_rule_metrics(
    scored_stream: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-event-time-window rule metrics — the streaming twin of the
    batch pipeline's per-partition metrics table (plans/pipeline.py
    partition_metrics: docs scanned, kept, per-rule drop counts), so a
    live ingest gets the same drift-monitoring surface the batch job
    checkpoints. Input is a `score_stream` output (rule_<name> flags +
    keep already computed by the shared Catalyst exprs — one
    projection, no recomputation here); one watermarked windowed
    aggregate, state bounded by the watermark. Works identically on a
    batch frame (parity test contract)."""
    from data_quality_checker_spark.plans.rules import RULE_NAMES
    from data_quality_checker_spark.plans.verdict import RULE_PREFIX

    return (
        scored_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
            *[
                F.sum(F.col(f"{RULE_PREFIX}{n}").cast("long")).alias(
                    f"fired_{n}"
                )
                for n in RULE_NAMES
            ],
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "docs",
            "kept",
            *[f"fired_{n}" for n in RULE_NAMES],
        )
    )
