"""Streaming dedup: replay suppression and within-watermark key dedup
(streaming/dedup_stream.py), via file-source availableNow runs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from data_quality_checker_spark.streaming import dedup_stream as DS

SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("text", StringType()),
    ]
)


def _write_input(spark, path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u1", t0, "hello world"),
        ("u1", t0, "hello world"),                          # exact replay
        ("u1", t0 + dt.timedelta(minutes=5), "hello world"),  # re-capture
        ("u2", t0, "other doc"),
        ("u2", t0 + dt.timedelta(hours=3), "other doc"),     # far re-capture
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _run(spark, in_dir, out_dir, ckpt, transform):
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def test_replay_suppression(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("dsin"))
    _write_input(spark, in_dir)
    got = _run(
        spark,
        in_dir,
        str(tmp_path_factory.mktemp("dsout")),
        str(tmp_path_factory.mktemp("dsckpt")),
        lambda s: DS.dedup_replays_stream(s, ["url"], "warc_ts", "1 hour"),
    )
    # exact replay of (u1, t0) suppressed; re-captures at new ts kept
    rows = {(r["url"], r["warc_ts"]) for r in got.collect()}
    assert len(rows) == 4 and got.count() == 4


def test_dedup_within_watermark_and_digest(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("dwin"))
    _write_input(spark, in_dir)
    got = _run(
        spark,
        in_dir,
        str(tmp_path_factory.mktemp("dwout")),
        str(tmp_path_factory.mktemp("dwckpt")),
        lambda s: DS.dedup_within_watermark(
            DS.with_content_digest(s),
            ["content_md5"],
            "warc_ts",
            "30 minutes",
        ),
    )
    # u1's three rows share a digest within 5 min -> collapse to 1;
    # u2's far re-capture (3h apart, one batch) still collapses within
    # the same availableNow batch unless watermark advanced between
    # micro-batches — assert at least the near-dup collapsed.
    by_url = {
        r["url"]: r["n"]
        for r in got.groupBy("url").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_url["u1"] == 1
    assert got.count() <= 3
    assert "content_md5" in got.columns
