"""Sustained SemDeDup at 550k vectors — corpus-scale evidence for the
semantic-dedup family (operators/semdedup.py): 500k clustered 64-d
synthetic embeddings (the geometry real corpora have) plus 50k planted
semantic clones (vec_id + 1,000,000; nonlinear per-element perturbation
x + 0.02*x^2 — a linear scale would leave cosine at exactly 1.0).

Measures, per stage:
 - seed + assignment wall (the O(n*k) broadcast stage) and the
   cell-size audit sum(cell^2) (the pair stage's candidate volume);
 - pair wall + pair count at tau=0.95;
 - planted recall: fraction of the 50k (i, i+1M) clone pairs found
   (both members must land in the same cell AND pass tau);
 - end-to-end semantic_dedup wall (components + keep rule) and the
   kept count (expect input - ~50k);
 - docs/s end-to-end.

Prints one JSON line for BENCH.md's hand-written SemDeDup section.
Usage: python tools/sustained_semdedup_bench.py [n_base] [k] [impl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_quality_checker_spark.operators import semdedup as SD
from data_quality_checker_spark.operators.dedup import release_cache
from data_quality_checker_spark.session import get_spark
from sustained_ann_bench import synth_vectors

DIM = 64


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    impl = sys.argv[3] if len(sys.argv) > 3 else "arrow"
    n_clones = n_base // 10
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    work = f"/tmp/dqc_semdedup_{n_base}"
    spark = get_spark(
        "dqc-semdedup-sustained",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"{work}/corpus"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        base = synth_vectors(spark, n_base, DIM, noise=0.3).withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        clones = base.filter(F.col("vec_id") < n_clones).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(0.02) * x * x
            ).alias("embedding"),
        )
        base.unionAll(clones).repartition(128).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_total = corpus.count()

    t0 = time.time()
    cents = SD.seed_centroids(corpus, k=k, dim=DIM)
    assign = SD.assign_cells(corpus, cents, dim=DIM, impl=impl)
    audit = (
        SD.cell_sizes(assign)
        .agg(
            F.sum(F.col("n_members") * F.col("n_members")).alias("sq"),
            F.max("n_members").alias("mx"),
            F.count(F.lit(1)).alias("cells"),
        )
        .collect()[0]
    )
    t_assign = time.time() - t0

    t0 = time.time()
    pairs = SD.semantic_dedup_pairs(
        corpus, k=k, tau=0.95, dim=DIM, impl=impl
    ).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    planted = pairs.filter(
        (F.col("id_b") - F.col("id_a") == 1_000_000)
        & (F.col("id_a") < n_clones)
    ).count()
    recall = planted / n_clones
    pairs.unpersist()
    release_cache(pairs)  # the operator's own assignment cache

    t0 = time.time()
    deduped = SD.semantic_dedup(corpus, k=k, tau=0.95, dim=DIM, impl=impl)
    kept = deduped.count()
    release_cache(deduped)
    t_dedup = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "sustained_semdedup",
                "impl": impl,
                "n_vectors": n_total,
                "n_planted_clones": n_clones,
                "k_cells": int(audit["cells"]),
                "sum_cell_sq": int(audit["sq"]),
                "max_cell": int(audit["mx"]),
                "assign_sec": round(t_assign, 1),
                "pairs_sec": round(t_pairs, 1),
                "n_pairs": n_pairs,
                "planted_recall": round(recall, 4),
                "dedup_e2e_sec": round(t_dedup, 1),
                "kept": kept,
                "docs_per_sec_e2e": round(n_total / t_dedup, 0),
                "cpus": cpus,
            }
        ),
        flush=True,
    )
    leaked = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    print(f"persistent RDDs after runs: {len(leaked)}")


if __name__ == "__main__":
    main()
