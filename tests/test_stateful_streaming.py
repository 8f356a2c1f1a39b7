"""applyInPandasWithState: per-key running stats over a file stream,
with state carried across two availableNow restarts (same checkpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.streaming.stateful import (
    running_stats_stream,
)


def _run_batch(spark, in_dir, ckpt, out_dir):
    stream = (
        spark.readStream.schema("user_id long, value double")
        .parquet(in_dir)
    )
    out = running_stats_stream(stream, "user_id", "value", alpha=0.5)

    def sink(batch_df, batch_id):
        # foreachBatch: update-mode rows land in parquet (and supports
        # checkpoint recovery, unlike the memory sink)
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_running_stats_state_survives_restart(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("sst_in"))
    ckpt = str(tmp_path_factory.mktemp("sst_ckpt"))

    out1 = str(tmp_path_factory.mktemp("sst_out1"))
    out2 = str(tmp_path_factory.mktemp("sst_out2"))

    spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "user_id long, value double"
    ).write.mode("append").parquet(in_dir)
    _run_batch(spark, in_dir, ckpt, out1)
    first = {
        r["key"]: r for r in spark.read.parquet(out1).collect()
    }
    assert first["1"]["n_events"] == 2
    assert first["1"]["running_mean"] == 15.0
    assert first["1"]["ewma"] == 0.5 * 20.0 + 0.5 * 10.0
    assert first["2"]["n_events"] == 1

    # second micro-run with NEW data only; state must resume from ckpt
    spark.createDataFrame(
        [(1, 30.0)], "user_id long, value double"
    ).write.mode("append").parquet(in_dir)
    _run_batch(spark, in_dir, ckpt, out2)
    second = {
        r["key"]: r for r in spark.read.parquet(out2).collect()
    }
    assert second["1"]["n_events"] == 3
    assert second["1"]["running_mean"] == 20.0
    assert second["1"]["ewma"] == 0.5 * 30.0 + 0.5 * 15.0
    assert "2" not in second  # update mode: untouched keys not re-emitted


def test_ewma_sorted_by_event_time_within_batch(spark, tmp_path_factory):
    """The ts-ordered fold: rows land in the micro-batch in scrambled
    file/shuffle order, but the EWMA must equal the event-time-ordered
    recurrence (the pre-fix fold used Arrow arrival order)."""
    import datetime as dt

    in_dir = str(tmp_path_factory.mktemp("ewt_in"))
    ckpt = str(tmp_path_factory.mktemp("ewt_ckpt"))
    out = str(tmp_path_factory.mktemp("ewt_out"))

    base = dt.datetime(2024, 1, 1)
    vals = [3.0, 9.0, 1.0, 7.0, 5.0]
    rows = [
        (1, base + dt.timedelta(seconds=i), v) for i, v in enumerate(vals)
    ]
    # write in REVERSED event-time order, one file per row: the batch
    # assembles them in arbitrary (non-ts) order
    for r in reversed(rows):
        spark.createDataFrame(
            [r], "user_id long, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(in_dir)
    res = running_stats_stream(stream, "user_id", "value", alpha=0.5)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        res.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out).orderBy(F.desc("n_events")).first()

    want = None
    for v in vals:  # ts order
        want = v if want is None else 0.5 * v + 0.5 * want
    assert got["n_events"] == 5
    assert abs(got["ewma"] - want) < 1e-12
