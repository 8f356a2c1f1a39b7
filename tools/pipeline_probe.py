"""Pipeline-only throughput probe at a given parallelism (fresh JVM).

Usage: python tools/pipeline_probe.py <cpus> [n_docs] [warmups] [runs]
Prints: PROBE cpus=<c> n=<n> best_sec=<s> docs_per_sec=<r>
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from data_quality_checker_spark.session import get_spark
from data_quality_checker_spark.plans import synth
from data_quality_checker_spark.plans.pipeline import (
    PipelineConfig,
    score_pages,
)


def main():
    cpus = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    warmups = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = get_spark(
        "pipeline-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import os

    path = f"/tmp/dqc_bench/pages_v2_probe_n{n}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        synth.pages_df_distributed(spark, n, seed=42).repartition(
            64
        ).write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)
    cfg = PipelineConfig(num_buckets=64)
    for _ in range(warmups):
        score_pages(pages, cfg).filter("keep").count()
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.time()
        score_pages(pages, cfg).filter("keep").count()
        best = min(best, time.time() - t0)
    print(
        f"PROBE cpus={cpus} n={n} best_sec={best:.1f} "
        f"docs_per_sec={n / best:.0f}"
    )


if __name__ == "__main__":
    main()
