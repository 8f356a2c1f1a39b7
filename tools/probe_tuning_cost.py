"""Measure the construction-time cost of tuning.plan_size_bytes /
parallel_input probes per query (guide §1): monkey-patch the tuning
module with timing accumulators, construct each headline query twice
(cold + warm), report per-query probe counts and seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import __spark_entry__ as entrymod
from data_quality_checker_spark import tuning
from data_quality_checker_spark.session import get_spark

acc = {"psb_n": 0, "psb_s": 0.0, "pi_n": 0, "pi_s": 0.0}

_psb = tuning.plan_size_bytes
_pi = tuning.parallel_input


def psb(df):
    t0 = time.time()
    try:
        return _psb(df)
    finally:
        acc["psb_n"] += 1
        acc["psb_s"] += time.time() - t0


def pi(df):
    t0 = time.time()
    try:
        return _pi(df)
    finally:
        acc["pi_n"] += 1
        acc["pi_s"] += time.time() - t0


tuning.plan_size_bytes = psb
# parallel_input calls plan_size_bytes via scaled_partitions; count the
# probe part (analyzed-plan toString + possible .rdd) separately by
# subtracting — simplest: wrap and report both totals.
tuning.parallel_input = pi
# re-point names imported inside functions (modules import the
# functions lazily via `from ... import`, so patching the module
# attributes is enough for call sites that do the import at call time)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "probe-tuning",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    B._vectors_parquet(spark)
    B._minhash_index_parquet(spark, sf_dir)

    queries = entrymod.queries()
    print(
        f"{'query':28s} {'constr':>7s} {'psb_n':>5s} {'psb_s':>6s} "
        f"{'pi_n':>4s} {'pi_s':>6s}"
    )
    for leg in range(2):
        if leg:
            print("--- warm leg ---")
        for name in B.HEADLINE:
            fn = B.BENCH_OVERRIDES.get(name) or queries[name]
            for k in acc:
                acc[k] = 0 if k.endswith("_n") else 0.0
            t0 = time.time()
            df = fn(spark, sf_dir)
            c = time.time() - t0
            if leg:
                print(
                    f"{name:28s} {c:7.3f} {acc['psb_n']:5d} "
                    f"{acc['psb_s']:6.3f} {acc['pi_n']:4d} {acc['pi_s']:6.3f}"
                )
            # drop without executing; release any construction caches
            for dep in getattr(df, "_cached_deps", ()):
                dep.unpersist()


if __name__ == "__main__":
    main()
