"""Streaming parity: the stream path produces exactly the batch path's
results (same rule exprs), and checkpoint restart doesn't duplicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.plans import synth
from data_quality_checker_spark.plans.pipeline import (
    PipelineConfig,
    score_pages,
)
from data_quality_checker_spark.streaming.stream import (
    run_stream_available_now,
)


def _checksum(df):
    return df.select(
        F.sum(
            F.xxhash64("url", "keep", "scrubbed_text").cast("decimal(38,0)")
        )
    ).collect()[0][0]


def test_stream_matches_batch_and_is_exactly_once(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("stream_in"))
    out_dir = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    pages = synth.pages_df(spark, 400, seed=7)
    pages.write.mode("overwrite").parquet(in_dir)

    cfg = PipelineConfig(dedup_latest_capture=False)
    run_stream_available_now(spark, in_dir, out_dir, ckpt, cfg)

    got = spark.read.parquet(out_dir)
    expect = score_pages(spark.read.parquet(in_dir), cfg)
    assert got.count() == expect.count()
    assert _checksum(got) == _checksum(expect)

    # re-run with same checkpoint: no new input -> no duplicates
    run_stream_available_now(spark, in_dir, out_dir, ckpt, cfg)
    assert spark.read.parquet(out_dir).count() == expect.count()
