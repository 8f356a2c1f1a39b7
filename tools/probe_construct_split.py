"""Construct-vs-execute split for every headline bench query
(guide §1 measure-first): runs the frozen bench harness's query list
with the same session config, but times fn() (plan construction +
any construction-time collects) separately from .count().
Two interleaved legs; prints the warm (second) leg.
Run: python tools/probe_construct_split.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import __spark_entry__ as entrymod
from data_quality_checker_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "probe-construct",
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
    legs: dict[str, list[tuple[float, float]]] = {}
    for _ in range(2):
        for name in B.HEADLINE:
            fn = B.BENCH_OVERRIDES.get(name) or queries[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            legs.setdefault(name, []).append(
                (round(t1 - t0, 3), round(t2 - t1, 3))
            )
            for dep in getattr(df, "_cached_deps", ()):
                dep.unpersist()
    out = {}
    print(f"{'query':28s} {'constr':>7s} {'exec':>7s} {'total':>7s}")
    rows = sorted(
        legs.items(), key=lambda kv: -(kv[1][1][0] + kv[1][1][1])
    )
    for name, ll in rows:
        c, e = ll[1]
        out[name] = {"construct": c, "exec": e}
        print(f"{name:28s} {c:7.3f} {e:7.3f} {c + e:7.3f}")
    tot_c = sum(v["construct"] for v in out.values())
    tot_e = sum(v["exec"] for v in out.values())
    print(f"{'TOTAL':28s} {tot_c:7.3f} {tot_e:7.3f} {tot_c + tot_e:7.3f}")
    with open("/tmp/construct_split.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
