"""Phase probe for the semantic_dedup_text bench leg (guide §1):
times construction vs execution and the individual driver-sequenced
phases, with job descriptions so the UI/eventlog attributes stages.
Run: python tools/probe_semdedup_text.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_quality_checker_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "probe-semdedup",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    from data_quality_checker_spark.plans import embed as E
    from data_quality_checker_spark.plans.embed import (
        doc_vectors,
        exact_text_groups,
    )
    from data_quality_checker_spark.operators import semdedup as SD

    def jobs() -> int:
        t = sc.statusTracker()
        return len(t.getJobIdsForGroup(None) or [])

    for leg in range(2):
        print(f"=== leg {leg} ===")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.time()
        j0 = jobs()

        # phase 1: exact group + embed build (lazy) ---------------
        member, rep_of = exact_text_groups(docs, "doc_id", "text")
        base = docs.join(
            rep_of.select(F.col("_rid").alias("doc_id")), "doc_id",
            "left_semi",
        )
        vecs = doc_vectors(
            base, "doc_id", "text", "hashing", 128, impl="arrow"
        ).persist()
        t1 = time.time()
        print(f"construct embed (lazy): {t1-t0:.3f}s jobs={jobs()-j0}")

        # phase 2: centroid draw (collect -> materializes persist)
        sc.setJobDescription("probe: centroid draw")
        cents = SD.seed_centroids(vecs, "doc_id", "embedding", 32, 128)
        rows = cents.collect()
        t2 = time.time()
        print(f"centroid draw+embed materialize: {t2-t1:.3f}s jobs={jobs()-j0}")

        # phase 3: assignment + fused losers -> anti join ---------
        sc.setJobDescription("probe: assignment+losers count")
        cents_df = spark.createDataFrame(rows, cents.schema)
        assign_v = SD._assign_cells_arrow(
            SD._clean(vecs, "doc_id", "embedding", 128),
            cents_df,
            "bigint",
            with_vec=True,
        )
        losers = SD._cell_components_arrow(
            assign_v, 0.95, "bigint", mode="losers", keep="low"
        ).withColumnRenamed("id", "doc_id")
        kept = vecs.join(losers, "doc_id", "left_anti")
        n_kept = kept.count()
        t3 = time.time()
        print(f"assign+losers+anti count={n_kept}: {t3-t2:.3f}s jobs={jobs()-j0}")

        # phase 4: the full wrapper (fresh, as the bench runs it) --
        for dep in (vecs,) + tuple(getattr(vecs, "_cached_deps", ())):
            dep.unpersist()
        sc.setJobDescription("probe: full semantic_dedup_text")
        t4 = time.time()
        out = E.semantic_dedup_text(
            docs, dim=128, k=32, tau=0.95, impl="arrow"
        )
        t5 = time.time()
        n = out.count()
        t6 = time.time()
        print(
            f"full wrapper: construct {t5-t4:.3f}s count({n}) "
            f"{t6-t5:.3f}s total {t6-t4:.3f}s jobs={jobs()-j0}"
        )
        for dep in getattr(out, "_cached_deps", ()):
            dep.unpersist()
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
