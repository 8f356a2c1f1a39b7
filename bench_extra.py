"""Round-7 optimization measurement harness (guide §1.4): isolates
individual bench queries with the SAME session shape as the frozen
bench.py (local[$SPARK_GRAFT_CPUS], 256 shuffle partitions, AQE
coalescing off), times df.count() exactly like bench.py's legs, and
optionally dumps .explain('formatted') to plans/r07/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--legs N] [--plans TAG] [query ...]

bench.py itself stays FROZEN (driver contract); every number quoted in
OPTIMIZATION_r07.md that is not a full bench.py headline comes from
here.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
import bench as benchmod
from data_quality_checker_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    legs = 2
    plans_tag = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--legs":
            legs = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_tag = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    if not names:
        names = list(benchmod.HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "dqc-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    benchmod._vectors_parquet(spark)
    benchmod._minhash_index_parquet(spark, sf_dir)

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "plans", "r07")
    os.makedirs(plan_dir, exist_ok=True)

    results: dict[str, list[float]] = {n: [] for n in names}
    for leg in range(legs):
        for name in names:
            fn = benchmod.BENCH_OVERRIDES.get(name) or queries[name]
            spark.sparkContext.setJobDescription(f"{name} leg{leg}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            results[name].append(round(time.time() - t0, 3))
            if leg == 0 and plans_tag:
                with open(f"{plan_dir}/{name}_{plans_tag}.txt", "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            for dep in getattr(df, "_cached_deps", ()):
                dep.unpersist()
            spark.sparkContext.setJobDescription(None)
    best = {n: min(v) for n, v in results.items()}
    print(json.dumps({"best": best, "legs": results}, indent=1,
                     sort_keys=True))


if __name__ == "__main__":
    main()
