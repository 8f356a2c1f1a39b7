"""Watermark semantics: finalized windows are emitted once (append
mode) and data arriving later than the watermark is dropped — the
emitted counts never change."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_quality_checker_spark.streaming.windowed import (
    windowed_event_counts,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(BASE + dt.timedelta(minutes=m), k, v) for m, k, v in rows],
        "ts timestamp, event_type string, value double",
    )


def _run(spark, in_dir, ckpt, out_dir):
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(in_dir)
    q = (
        windowed_event_counts(stream, window="10 minutes", watermark="20 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_watermark_drops_late_data(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("w_in"))
    ckpt = str(tmp_path_factory.mktemp("w_ckpt"))
    out_dir = str(tmp_path_factory.mktemp("w_out"))

    # batch 1: two events in window [0,10), max event time 35min
    # -> watermark 15min -> window [0,10) finalized with n=2
    _mk(
        spark,
        [(1, "click", 1.0), (5, "click", 3.0), (35, "click", 9.0)],
    ).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir)
    first = {
        (r["window_start"], r["key"]): r["n"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert first[(BASE, "click")] == 2

    # batch 2: a LATE event for window [0,10) (watermark already 15min)
    # plus a fresh event far ahead that finalizes [30,40)
    _mk(
        spark, [(2, "click", 100.0), (70, "click", 5.0)]
    ).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir)
    final = [
        r
        for r in spark.read.parquet(out_dir).collect()
        if r["window_start"] == BASE
    ]
    # the finalized [0,10) window was emitted exactly once, with the
    # late row dropped (n stays 2, mean stays 2.0)
    assert len(final) == 1
    assert final[0]["n"] == 2 and final[0]["mean_value"] == 2.0
    # the 30-40min window got finalized by batch 2's watermark advance
    win30 = [
        r
        for r in spark.read.parquet(out_dir).collect()
        if r["window_start"] == BASE + dt.timedelta(minutes=30)
    ]
    assert len(win30) == 1 and win30[0]["n"] == 1


def test_windowed_counts_batch_parity(spark):
    df = _mk(spark, [(1, "a", 2.0), (5, "a", 4.0), (12, "b", 6.0)])
    rows = {
        (r["window_start"], r["key"]): (r["n"], r["mean_value"])
        for r in windowed_event_counts(df).collect()
    }
    assert rows[(BASE, "a")] == (2, 3.0)
    assert rows[(BASE + dt.timedelta(minutes=10), "b")] == (1, 6.0)


def test_windowed_rule_metrics_stream_matches_batch(
    spark, tmp_path_factory
):
    """The streaming rule-metrics table (windowed per-rule drop counts
    over scored pages) equals the same aggregate computed in batch, and
    availableNow + checkpoint is exactly-once."""
    from data_quality_checker_spark.plans import synth
    from data_quality_checker_spark.plans.pipeline import (
        PipelineConfig,
        score_pages,
    )
    from data_quality_checker_spark.streaming.stream import score_stream
    from data_quality_checker_spark.streaming.windowed import (
        windowed_rule_metrics,
    )

    in_dir = str(tmp_path_factory.mktemp("wm_in"))
    out_dir = str(tmp_path_factory.mktemp("wm_out"))
    ckpt = str(tmp_path_factory.mktemp("wm_ckpt"))

    pages = synth.pages_df(spark, 300, seed=11)
    pages.write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    cfg = PipelineConfig(dedup_latest_capture=False)

    def _stream_once():
        q = (
            windowed_rule_metrics(
                score_stream(
                    spark.readStream.schema(schema).parquet(in_dir), cfg
                ),
                window="10 minutes",
                watermark="5 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _stream_once()

    got = {
        r["window_start"]: r.asDict()
        for r in spark.read.parquet(out_dir).collect()
    }
    # append mode emits only FINALIZED windows (window_end <= max event
    # time - watermark); windows still inside the watermark stay in
    # state when availableNow terminates. Batch ignores the watermark,
    # so restrict the batch twin to the finalized range.
    batch = score_pages(spark.read.parquet(in_dir), cfg)
    max_ts = batch.agg(F.max("warc_ts")).collect()[0][0]
    import datetime as _dt

    horizon = max_ts - _dt.timedelta(minutes=5)
    expect = {
        r["window_start"]: r.asDict()
        for r in windowed_rule_metrics(
            batch, window="10 minutes", watermark="5 minutes"
        ).collect()
        if r["window_end"] <= horizon
    }
    assert got == expect and len(got) > 0
    # every finalized window's counts are complete and per-rule sums
    # are bounded by docs
    for r in got.values():
        assert r["kept"] <= r["docs"]

    # replay with the same checkpoint: no new input -> no duplicates
    _stream_once()
    assert spark.read.parquet(out_dir).count() == len(expect)
