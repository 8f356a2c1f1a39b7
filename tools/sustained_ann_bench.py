"""Sustained ANN at 1M vectors — the one dedup/similarity family
without a corpus-scale BENCH.md row: build a disk-backed IVF index
over 1,000,000 synthetic 64-d embeddings (deterministic hash-derived,
generated distributed — no driver loop), search a 200-query batch, and
grade recall against exact brute force on the same queries.

Measures:
 - index build wall (KMeans on a 2% sample + one shuffle-free
   assignment projection, parquet partitioned by cell);
 - batched query wall at n_probe=4 of 64 cells (the partition-pruned
   read path) and the implied queries/sec;
 - exact brute-force wall on the same 200 queries (the baseline the
   approximation must beat);
 - recall@10 of IVF vs brute force.

Prints one JSON line for BENCH.md's hand-written ANN section."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_quality_checker_spark.operators import similarity as SIM
from data_quality_checker_spark.session import get_spark

N_VECS = 1_000_000
DIM = 64
N_QUERIES = 200
K = 10


def synth_vectors(
    spark,
    n: int,
    dim: int,
    seed: int = 42,
    n_clusters: int = 256,
    noise: float = 0.15,
):
    """Deterministic CLUSTERED vectors — the geometry real embedding
    corpora have (topic/style clusters) and the operating regime IVF
    is built for: vector i = center[hash(i) % n_clusters] + per-(i,j)
    hash noise. One projection over spark.range, no driver data.
    ``noise=None``/``n_clusters=0`` degenerates to uniform — the
    adversarial no-structure case where ANY coarse quantizer's recall
    collapses (neighbors of a uniform point straddle many Voronoi
    cells; measured 0.365@probe-4/64 — kept in BENCH.md as the floor).
    """

    def h_unit(*cols):
        # centered hash uniform in [-1, 1)
        return (
            F.pmod(F.xxhash64(*cols), F.lit(2_000_000)).cast("double")
            / 1_000_000.0
            - 1.0
        )

    if not n_clusters or noise is None:
        comps = [
            h_unit(F.col("id"), F.lit(j), F.lit(seed)).cast("float")
            for j in range(dim)
        ]
    else:
        cl = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(n_clusters))
        comps = [
            (
                h_unit(cl, F.lit(j), F.lit(seed + 1))
                + F.lit(noise) * h_unit(F.col("id"), F.lit(j), F.lit(seed + 2))
            ).cast("float")
            for j in range(dim)
        ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    work = "/tmp/dqc_ann_bench"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(
        "dqc-ann-sustained",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"{work}/corpus"
    synth_vectors(spark, N_VECS, DIM).repartition(128).write.parquet(
        corpus_path
    )
    corpus = spark.read.parquet(corpus_path)
    queries = corpus.filter(F.col("vec_id") % (N_VECS // N_QUERIES) == 17)
    n_q = queries.count()

    t0 = time.time()
    index = SIM.build_ivf_index(
        corpus,
        num_centroids=256,
        sample_fraction=0.02,
        storage_path=f"{work}/ivf",
    )
    build_sec = time.time() - t0

    t0 = time.time()
    ivf = {
        (r["query_id"], r["rank"]): r["id"]
        for r in SIM.search_ivf(index, queries, k=K, n_probe=4).collect()
    }
    ivf_sec = time.time() - t0

    t0 = time.time()
    bf = {
        (r["query_id"], r["rank"]): r["id"]
        for r in SIM.topk_bruteforce(corpus, queries, k=K).collect()
    }
    bf_sec = time.time() - t0

    # recall@K: fraction of exact neighbors the IVF probe recovered
    by_q_ivf: dict = {}
    for (q, _), i in ivf.items():
        by_q_ivf.setdefault(q, set()).add(i)
    by_q_bf: dict = {}
    for (q, _), i in bf.items():
        by_q_bf.setdefault(q, set()).add(i)
    recalls = [
        len(by_q_ivf.get(q, set()) & s) / len(s)
        for q, s in by_q_bf.items()
    ]
    recall = sum(recalls) / len(recalls)

    print(
        json.dumps(
            {
                "metric": "ann_ivf_sustained_1m",
                "n_vectors": N_VECS,
                "dim": DIM,
                "n_queries": n_q,
                "cpus": cpus,
                "build_sec": round(build_sec, 2),
                "ivf_query_sec": round(ivf_sec, 2),
                "ivf_queries_per_sec": round(n_q / ivf_sec, 1),
                "bruteforce_sec": round(bf_sec, 2),
                "speedup_vs_bruteforce": round(bf_sec / ivf_sec, 2),
                "recall_at_10": round(recall, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
