"""Streaming ingest: readStream -> score (same Catalyst rule exprs as
batch) -> writeStream, with checkpointed exactly-once file sink.

The reference is batch-only (SURVEY.md §2.12); the pipeline stays
batch-first (Iceberg snapshots + lineage resume), and this module is
the incremental path: identical `score_pages` transformation, so batch
and stream can never drift semantically. Latest-capture dedup is a
global window — not streamable — so streaming scores every capture and
the compaction job (batch) picks latest per url downstream.

Watermark note: event-time aggregations downstream should watermark on
warc_ts; the score step itself is stateless per row."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_quality_checker_spark.plans.pipeline import (
    PipelineConfig,
    score_pages,
)
from data_quality_checker_spark.plans.synth import PAGE_SCHEMA


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """``max_files_per_trigger`` bounds each micro-batch. It is also
    the batch's PARALLELISM CAP for the stateless score plan (no
    shuffle -> tasks == input files), so size it to >= the executor
    core count: an availableNow backfill on 32 cores with the default
    8 runs at 25% utilization and loses ~3x wall clock (measured,
    BENCH.md Streaming section). Low-latency tailing of a live
    directory is the only reason to keep it small."""
    return (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def score_stream(pages_stream: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    cfg = cfg or PipelineConfig(dedup_latest_capture=False)
    if cfg.dedup_latest_capture:
        raise ValueError(
            "latest-capture dedup needs a global window; disable it for "
            "streaming and compact in batch"
        )
    return score_pages(pages_stream, cfg)


def run_stream_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int = 8,
) -> None:
    """Process everything currently in input_dir exactly once and stop
    (the batch-like trigger used by tests and backfills). For backfill
    throughput set ``max_files_per_trigger`` >= the core count (see
    read_pages_stream)."""
    scored = score_stream(
        read_pages_stream(spark, input_dir, max_files_per_trigger), cfg
    )
    q = (
        scored.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_decontam_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    eval_df: DataFrame,
    cfg: PipelineConfig | None = None,
) -> None:
    """Streaming scoring + benchmark decontamination. The
    contamination decision is per-document against a STATIC eval
    corpus, so foreachBatch is semantically EXACT (no cross-batch
    state; a doc's verdict cannot depend on other stream rows). The
    eval n-gram table is distilled once to 8-byte xxhash64 keys,
    persisted, and broadcast-joined inside every micro-batch.

    Sink is parquet append inside foreachBatch: with availableNow +
    checkpointing a restarted query may replay the last uncommitted
    batch — downstream readers dedup on url like the batch pipeline's
    dynamic-overwrite resume does."""
    from data_quality_checker_spark.operators.decontam import eval_ngrams
    from data_quality_checker_spark.plans.pipeline import (
        with_decontam_verdict,
    )

    cfg = cfg or PipelineConfig(dedup_latest_capture=False)
    ev = eval_ngrams(
        eval_df, n=cfg.decontam_ngram, key_mode="xxhash64"
    ).persist()
    ev.count()  # materialize once; reused by every micro-batch
    scored = score_stream(read_pages_stream(spark, input_dir), cfg)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        out = with_decontam_verdict(
            batch_df, ev, cfg, eval_is_ngrams=True
        )
        out.write.mode("append").parquet(output_dir)

    q = (
        scored.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # a failed micro-batch must not leak the persisted eval table
        # into the (long-lived) session
        ev.unpersist()


def run_stream_with_near_dedup_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int = 8,
    storage_path: str | None = None,
) -> str:
    """Streaming ingest + scoring (exactly-once availableNow), then
    the corpus-level near-dedup stage as a BATCH post-pass over the
    streamed sink, final output at ``{output_dir}/final``.

    Why a post-pass and not foreachBatch state: MinHash-LSH candidate
    generation is corpus-GLOBAL — a per-micro-batch form would only
    pair documents that share a batch, and a cross-batch signature
    store would make each verdict depend on arrival order (a replayed
    batch after checkpoint recovery could flip winners). Scoring
    streams incrementally; the near-dedup compaction runs over the
    complete scored snapshot, exactly like the latest-capture url
    dedup this module already delegates downstream. Batch parity is
    therefore EXACT by construction: the post-pass is a pure function
    of the scored ROW SET, and with_near_dup_verdict picks each url's
    sketch representative deterministically (min-md5 text — NOT
    layout-dependent dropDuplicates, which could sketch different
    captures for the streamed sink vs the batch input and flip
    near_dup_of). Pinned by
    tests/test_streaming.py and measured at v2-corpus scale in
    BENCH.md's Streaming section.

    Restart semantics: the scoring stream resumes from
    ``checkpoint_dir`` exactly-once; the post-pass is a deterministic
    pure function of the scored snapshot and overwrite-idempotent.
    """
    from data_quality_checker_spark.operators.dedup import release_cache
    from data_quality_checker_spark.plans.pipeline import (
        with_near_dup_verdict,
    )

    cfg = cfg or PipelineConfig(dedup_latest_capture=False)
    scored_dir = f"{output_dir}/scored"
    final_dir = f"{output_dir}/final"
    run_stream_available_now(
        spark,
        input_dir,
        scored_dir,
        checkpoint_dir,
        cfg,
        max_files_per_trigger,
    )
    scored = spark.read.parquet(scored_dir)
    out = with_near_dup_verdict(scored, cfg, storage_path=storage_path)
    out.write.mode("overwrite").parquet(final_dir)
    release_cache(out)
    return final_dir
