"""Sustained-scale bench for the round-3 extension operators over the
800k-doc bench corpus (reuses bench.py's cached parquet; generates it
if absent). Prints one JSON line; numbers recorded in BENCH.md.

Three legs:
 - decontamination: 800k-doc corpus vs a 2,000-doc eval slice
   (13-gram collision, xxhash64 keys, broadcast eval)
 - line_dedup/doc: whole-doc-as-line (exact-dup regime)
 - line_dedup/word: every word its own line (~80M lines, extreme
   duplication — the map-side-combine skew stress: a handful of
   'lines' each occur tens of millions of times)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_quality_checker_spark.operators.decontam import (
    contamination_report,
)
from data_quality_checker_spark.operators.dedup import dedup_lines_corpus
from data_quality_checker_spark.session import get_spark


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_EXT_DOCS", "800000"))
    spark = get_spark(
        "dqc-ext-sustained",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/dqc_bench/pages_v2_ext_n{n_docs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        from data_quality_checker_spark.plans import synth

        synth.pages_df_distributed(spark, n_docs, seed=42).repartition(
            64
        ).write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path).select(
        F.col("url"), F.col("text")
    )
    n = pages.count()
    out: dict = {"docs": n, "cpus": cpus}

    ev = pages.filter("text is not null").limit(2000).select("text")
    t0 = time.time()
    rep = contamination_report(
        pages, ev, id_col="url", n=13, key_mode="xxhash64"
    )
    contaminated = rep.filter("contaminated").count()
    dt = time.time() - t0
    out["decontam"] = {
        "sec": round(dt, 1),
        "docs_per_sec": round(n / dt),
        "contaminated": contaminated,
    }

    t0 = time.time()
    d1 = dedup_lines_corpus(pages, id_col="url")
    removed = d1.agg(F.sum("n_removed")).collect()[0][0]
    dt = time.time() - t0
    out["line_dedup_doc"] = {
        "sec": round(dt, 1),
        "docs_per_sec": round(n / dt),
        "lines_removed": int(removed),
    }

    words = pages.withColumn(
        "text", F.regexp_replace("text", " ", "\n")
    )
    t0 = time.time()
    d2 = dedup_lines_corpus(words, id_col="url")
    row = d2.agg(
        F.sum("n_lines").alias("nl"), F.sum("n_removed").alias("nr")
    ).collect()[0]
    dt = time.time() - t0
    out["line_dedup_word"] = {
        "sec": round(dt, 1),
        "lines": int(row["nl"]),
        "lines_removed": int(row["nr"]),
        "lines_per_sec": round(row["nl"] / dt),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
