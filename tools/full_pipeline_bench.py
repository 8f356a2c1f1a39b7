"""Flagship ALL-STAGES pipeline run at bench scale — the end-to-end
workflow a crawl operator actually runs, not just the score stage:

  url prefilter (blocklist + shape flags + per-host cap)
    -> 12-rule battery + langid + PII scrub + verdict
    -> MinHash near-dedup (parquet-materialized sketches)
    -> benchmark decontamination (13-gram xxhash64 vs an eval slice)
    -> learned quality score (Spark ML LR artifact)
    -> partitioned scored output + metrics + lineage

over the 800k-doc v2 synthetic corpus on local[$SPARK_GRAFT_CPUS],
via run_pipeline (the resume-capable production entry), THEN a
kill/resume leg: a fresh out_dir processes only k partitions
(limit_partitions), and the resumed invocation must complete the rest
while the metrics table stays consistent (north-rule resumability at
scale, not just the test fixture).

Prints one JSON line; numbers go to BENCH.md's hand-written
'## Full-stage pipeline' section.
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
    run_pipeline,
    score_pages,
)
from data_quality_checker_spark.plans.quality_model import (
    train_quality_model,
)
from data_quality_checker_spark.session import get_spark


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.environ.get("SPARK_GRAFT_SF", "0.1"))
    work = "/tmp/dqc_full_pipeline"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(
        "dqc-full-pipeline",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    in_dir, n_docs = _pages_parquet(spark, sf)
    pages = spark.read.parquet(in_dir)

    # eval slice: 200 real corpus documents -> genuine 13-gram
    # collisions (those docs and their near-copies get dropped)
    eval_df = spark.createDataFrame(
        [
            (r["text"],)
            for r in pages.filter("text is not null")
            .orderBy("url")
            .limit(200)
            .collect()
        ],
        "text string",
    )
    blocklist = spark.createDataFrame(
        [("host1.example",), ("host7.example",)], ["domain"]
    )

    # quality-model artifact: weak labels from the rule verdict on a
    # deterministic ~50k hash sample (NOT limit(), which takes rows in
    # partition order and would train on a biased head-of-corpus
    # slice); train cost excluded from the pipeline wall — the
    # artifact ships with the job in production
    from data_quality_checker_spark.plans.sampling import (
        hash_frac_predicate,
    )

    t0 = time.time()
    sample = score_pages(
        pages.filter(
            hash_frac_predicate(F.col("url"), 50_000 / n_docs)
        ),
        PipelineConfig(dedup_latest_capture=False),
    ).select("text", "keep")
    model = train_quality_model(sample)
    model_path = f"{work}/quality_model"
    model.write().overwrite().save(model_path)
    train_sec = time.time() - t0

    cfg = PipelineConfig(
        num_buckets=64,
        near_dedup=True,
        near_dedup_threshold=0.85,
        url_prefilter=True,
        url_blocked_words=("casino",),
        max_docs_per_host=200_000,
    )

    # leg 1: the full uninterrupted run
    t0 = time.time()
    res = run_pipeline(
        spark,
        pages,
        f"{work}/full",
        cfg,
        run_id="full-0",
        decontam_eval=eval_df,
        url_blocklist=blocklist,
        quality_model_path=model_path,
    )
    full_sec = time.time() - t0
    assert len(res["processed_partitions"]) == cfg.num_buckets, res
    scored = spark.read.parquet(f"{work}/full/scored")
    stats = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep_final").cast("long")).alias("kept"),
        F.sum(F.col("contaminated").cast("long")).alias("contam"),
        F.sum(F.col("near_dup_of").isNotNull().cast("long")).alias("nd"),
    ).collect()[0]
    n_scored, n_final = stats["n"], stats["kept"]
    n_contam, n_neardup = stats["contam"], stats["nd"]
    metrics = spark.read.parquet(f"{work}/full/metrics")
    m_scanned = metrics.agg(F.sum("rows_scanned")).collect()[0][0]

    # leg 2: kill/resume — first invocation stops after 16 of 64
    # partitions, second completes; per-partition metrics must cover
    # every partition exactly once
    t0 = time.time()
    r1 = run_pipeline(
        spark, pages, f"{work}/resume", cfg, run_id="r-0",
        limit_partitions=16, decontam_eval=eval_df,
        url_blocklist=blocklist, quality_model_path=model_path,
    )
    r2 = run_pipeline(
        spark, pages, f"{work}/resume", cfg, run_id="r-1",
        decontam_eval=eval_df, url_blocklist=blocklist,
        quality_model_path=model_path,
    )
    resume_sec = time.time() - t0
    resumed = spark.read.parquet(f"{work}/resume/scored")
    rm = spark.read.parquet(f"{work}/resume/metrics")
    assert len(r1["processed_partitions"]) == 16
    assert r2["skipped"] == 16
    assert rm.select("partition_id").distinct().count() == 64
    assert resumed.count() == n_scored, (resumed.count(), n_scored)

    print(
        json.dumps(
            {
                "metric": "full_stage_pipeline_v2_corpus",
                "docs_in": n_docs,
                "cpus": cpus,
                "train_quality_model_sec": round(train_sec, 2),
                "full_run_sec": round(full_sec, 2),
                "full_docs_per_sec": round(n_docs / full_sec, 1),
                "rows_scored": n_scored,
                "rows_kept_final": n_final,
                "rows_contaminated": n_contam,
                "rows_near_dup": n_neardup,
                "metrics_rows_scanned": int(m_scanned),
                "resume_two_leg_sec": round(resume_sec, 2),
                "resume_partitions_leg1": len(r1["processed_partitions"]),
                "resume_skipped_leg2": r2["skipped"],
                "resume_row_parity": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
