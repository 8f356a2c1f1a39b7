"""Streaming-pipeline benchmark + batch-parity gate (round-3 verdict
item: prove the streaming surface at v2-corpus scale, not just the
small test fixtures).

Runs the full 12-rule + scrub verdict (plus opt-in decontamination)
through ``run_stream_available_now`` over the SAME 800k-doc v2 synthetic
corpus bench.py's pipeline leg uses, on local[$SPARK_GRAFT_CPUS]:

 - asserts EXACT batch parity (sum-of-xxhash64 checksum over
   (url, keep, scrubbed_text) of the streamed output vs score_pages
   run in batch on the same input);
 - reports streaming docs/s and the ratio vs the batch path measured
   in the same JVM (the verdict bar: within 2x of batch).

Prints one JSON line; paste the numbers into BENCH.md's
'## Streaming' hand-written section (scaling_bench.py preserves it).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _pages_parquet
from data_quality_checker_spark.plans.pipeline import (
    PipelineConfig,
    score_pages,
)
from data_quality_checker_spark.session import get_spark
from data_quality_checker_spark.streaming.stream import (
    run_stream_available_now,
)


def _checksum(df):
    return df.select(
        F.sum(
            F.xxhash64("url", "keep", "scrubbed_text").cast("decimal(38,0)")
        )
    ).collect()[0][0]


def _nd_checksum(df):
    return df.select(
        F.sum(
            F.xxhash64(
                "url", "keep_final", F.coalesce("near_dup_of", F.lit(""))
            ).cast("decimal(38,0)")
        )
    ).collect()[0][0]


def _near_dedup_leg(spark, in_dir, n_docs, cfg, cpus, work) -> None:
    """Streaming + near-dedup post-pass vs the batch composition
    (VERDICT r04 item 8): parity on (url, keep_final, near_dup_of)
    plus end-to-end throughput for both paths. One leg each — the
    near-dedup stage is iterative (clustering) and dominates, so
    best-of-N would mostly re-measure the JVM warmup of the same
    jobs."""
    from data_quality_checker_spark.operators.dedup import release_cache
    from data_quality_checker_spark.plans.pipeline import (
        with_near_dup_verdict,
    )
    from data_quality_checker_spark.streaming.stream import (
        run_stream_with_near_dedup_available_now,
    )

    # the v2 corpus has no genuine near-dups above threshold (every
    # clean text is a distinct function of id), so parity on
    # near_dup_of would be vacuously all-NULL — plant clones of ~2.5%
    # of docs (new url, one appended token) so the stage demonstrably
    # demotes and the checksum covers real cluster decisions
    base = spark.read.parquet(in_dir)
    clones = base.filter(
        "text is not null and length(text) > 200 and pmod(xxhash64(url), 40) = 0"
    ).selectExpr(
        "concat('https://clone.example/', md5(url)) as url",
        "warc_ts",
        "html",
        "concat(text, ' tail') as text",
        "lang",
    )
    planted_dir = f"{work}/in_planted"
    base.unionByName(clones).write.mode("overwrite").parquet(planted_dir)
    in_dir = planted_dir
    pages = spark.read.parquet(in_dir)
    n_docs = pages.count()
    # codegen warmup on the score projection only
    score_pages(pages, cfg).filter("keep").count()

    t0 = time.time()
    batch_out = with_near_dup_verdict(score_pages(pages, cfg), cfg)
    batch_out.write.mode("overwrite").parquet(f"{work}/batch_nd")
    release_cache(batch_out)
    batch_sec = time.time() - t0

    out_dir, ckpt = f"{work}/out_nd", f"{work}/ckpt_nd"
    t0 = time.time()
    final_dir = run_stream_with_near_dedup_available_now(
        spark, in_dir, out_dir, ckpt, cfg, max_files_per_trigger=cpus
    )
    stream_sec = time.time() - t0

    streamed = spark.read.parquet(final_dir)
    batch_back = spark.read.parquet(f"{work}/batch_nd")
    n_streamed = streamed.count()
    parity = _nd_checksum(streamed) == _nd_checksum(batch_back)
    demoted = streamed.filter("keep and not keep_final").count()
    assert n_streamed == n_docs, (n_streamed, n_docs)
    assert parity, "near-dedup stream checksum != batch checksum"

    print(
        json.dumps(
            {
                "metric": "streaming_near_dedup_v2_corpus",
                "docs": n_docs,
                "cpus": cpus,
                "stream_sec": round(stream_sec, 3),
                "stream_docs_per_sec": round(n_docs / stream_sec, 1),
                "batch_sec": round(batch_sec, 3),
                "batch_docs_per_sec": round(n_docs / batch_sec, 1),
                "stream_vs_batch_ratio": round(stream_sec / batch_sec, 3),
                "near_dup_demoted": demoted,
                "parity_checksum_match": parity,
            }
        )
    )


def main() -> None:
    near_dedup = "--near-dedup" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.environ.get("SPARK_GRAFT_SF", "0.1"))
    work = "/tmp/dqc_stream_bench" + ("_nd" if near_dedup else "")
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(
        "dqc-stream-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    in_dir, n_docs = _pages_parquet(spark, sf)
    # streaming scores every capture (latest-capture dedup is the
    # downstream batch compaction); batch comparison uses the same cfg
    cfg = PipelineConfig(
        dedup_latest_capture=False, num_buckets=64, near_dedup=near_dedup
    )
    if near_dedup:
        _near_dedup_leg(spark, in_dir, n_docs, cfg, cpus, work)
        spark.stop()
        return

    # batch reference in the same JVM, apples-to-apples: the batch leg
    # WRITES the scored parquet like the stream sink does (a
    # count-only batch leg would overstate the streaming penalty).
    # 1 warmup + best of 3.
    pages = spark.read.parquet(in_dir)
    score_pages(pages, cfg).filter("keep").count()  # codegen warmup
    batch_runs = []
    for i in range(3):
        t0 = time.time()
        score_pages(pages, cfg).write.mode("overwrite").parquet(
            f"{work}/batch_out"
        )
        batch_runs.append(time.time() - t0)
    batch_sec = min(batch_runs)

    # streaming run: availableNow processes the whole input once;
    # wall time includes micro-batch scheduling + checkpointing +
    # the exactly-once parquet sink commit protocol
    # max_files_per_trigger = core count: each micro-batch's task
    # count equals its file count for this shuffle-free plan, so the
    # default 8 would cap a 32-core box at 25% utilization (measured
    # 2.95x batch; with the cap lifted the gap is the honest
    # micro-batch + sink-commit overhead)
    out_dir, ckpt = f"{work}/out", f"{work}/ckpt"
    t0 = time.time()
    run_stream_available_now(
        spark, in_dir, out_dir, ckpt, cfg, max_files_per_trigger=cpus
    )
    stream_sec = time.time() - t0

    streamed = spark.read.parquet(out_dir)
    n_streamed = streamed.count()
    expect = score_pages(pages, cfg)
    parity = _checksum(streamed) == _checksum(expect)
    assert n_streamed == n_docs, (n_streamed, n_docs)
    assert parity, "stream output checksum != batch checksum"

    print(
        json.dumps(
            {
                "metric": "streaming_pipeline_v2_corpus",
                "docs": n_docs,
                "cpus": cpus,
                "stream_sec": round(stream_sec, 3),
                "stream_docs_per_sec": round(n_docs / stream_sec, 1),
                "batch_sec": round(batch_sec, 3),
                "batch_docs_per_sec": round(n_docs / batch_sec, 1),
                "stream_vs_batch_ratio": round(stream_sec / batch_sec, 3),
                "parity_checksum_match": parity,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
