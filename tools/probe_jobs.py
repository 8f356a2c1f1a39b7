"""Per-job breakdown of one bench query via the Spark UI REST API
(guide §7.1): runs the query's construct + count warm, then lists
every scheduler job with duration, task count, and description.
Run: python tools/probe_jobs.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import __spark_entry__ as entrymod
from data_quality_checker_spark.session import get_spark


def rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "probe-jobs",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    if name in ("semantic_dedup_pairs",):
        B._vectors_parquet(spark)
    if name in ("minhash_index_incr",):
        B._minhash_index_parquet(spark, sf_dir)

    queries = entrymod.queries()
    fn = B.BENCH_OVERRIDES.get(name) or queries[name]

    # warm leg first
    for _ in range(1):
        df = fn(spark, sf_dir)
        df.count()
        for dep in getattr(df, "_cached_deps", ()):
            dep.unpersist()

    jobs_before = {j["jobId"] for j in rest(spark, "jobs")}
    t0 = time.time()
    df = fn(spark, sf_dir)
    t1 = time.time()
    df.count()
    t2 = time.time()
    for dep in getattr(df, "_cached_deps", ()):
        dep.unpersist()
    print(f"construct {t1-t0:.3f}s count {t2-t1:.3f}s total {t2-t0:.3f}s")

    jobs = [
        j for j in rest(spark, "jobs") if j["jobId"] not in jobs_before
    ]
    jobs.sort(key=lambda j: j["jobId"])
    tot = 0.0
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    prev_end = None
    for j in jobs:
        st, en = ts(j["submissionTime"]), ts(j["completionTime"])
        dur = en - st
        gap = (st - prev_end) if prev_end else 0.0
        prev_end = en
        tot += dur
        print(
            f"job {j['jobId']:4d} dur {dur:6.3f}s gap {gap:6.3f}s "
            f"tasks {j['numTasks']:4d} {j.get('description','')[:90]}"
        )
    print(f"sum of job durations: {tot:.3f}s over {len(jobs)} jobs")
    stages = rest(spark, "stages?status=complete")
    sid = {}
    for j in jobs:
        for s in j.get("stageIds", []):
            sid[s] = j["jobId"]
    stages = [s for s in stages if s["stageId"] in sid]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    for s in stages[:12]:
        print(
            f"stage {s['stageId']:4d} job {sid[s['stageId']]:3d} "
            f"runtime {s.get('executorRunTime',0)/1000:7.2f}s "
            f"tasks {s['numCompleteTasks']:4d} {s['name'][:80]}"
        )


if __name__ == "__main__":
    main()
