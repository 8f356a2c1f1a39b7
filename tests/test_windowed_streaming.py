"""Watermark semantics: finalized windows are emitted once (append
mode) and data arriving later than the watermark is dropped — the
emitted counts never change."""

from __future__ import annotations

import datetime as dt

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
