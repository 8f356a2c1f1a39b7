"""Sustained near-dedup bench: near_duplicates_minhash over a 1M-doc
synthetic corpus on local[32] with parquet-materialized intermediates
(the crawl-scale form), timed with the signature pre-filter OFF vs ON.

The synthetic corpus is template-heavy — banded LSH surfaces tens of
millions of candidate pairs, so the exact-Jaccard verify join (shingle
array payload) dominates end-to-end time; the pre-filter drops
candidates whose signature-estimated Jaccard is below threshold-margin
BEFORE the arrays are joined. This script is the measurement behind
BENCH.md's "Sustained dedup at scale" section.

Usage: python tools/sustained_dedup_bench.py [n_docs] [off|on|both]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_quality_checker_spark import get_spark
from data_quality_checker_spark.operators import dedup as DD
from data_quality_checker_spark.plans import synth


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    root = f"/tmp/dqc_sustained_{n}"
    spark = get_spark(
        "dqc-sustained-dedup", master="local[32]", shuffle_partitions=256
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = f"{root}/pages"
    if not os.path.exists(f"{corpus}/_SUCCESS"):
        (
            synth.pages_df_distributed(spark, n, seed=42)
            .select("url", "text")
            .filter("text is not null")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(corpus)
        )
    docs = spark.read.parquet(corpus)

    legs = {
        "off": (("prefilter_off", None),),
        "on": (("prefilter_on", 0.15),),
        "both": (("prefilter_off", None), ("prefilter_on", 0.15)),
    }[which]
    for tag, margin in legs:
        out = f"{root}/{tag}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        pairs = DD.near_duplicates_minhash(
            docs,
            id_col="url",
            text_col="text",
            threshold=0.8,
            storage_path=out,
            prefilter_margin=margin,
        )
        n_pairs = pairs.count()
        dt = time.time() - t0
        print(
            f"{tag}: {n_pairs} pairs in {dt:.1f}s "
            f"({n / dt:.0f} docs/s end-to-end)",
            flush=True,
        )
    # leak criterion: nothing persists after storage_path runs
    leaked = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    print(f"persistent RDDs after runs: {len(leaked)}")


if __name__ == "__main__":
    main()
