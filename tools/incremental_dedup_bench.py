"""Incremental index-backed dedup vs full re-dedup — the measurement
behind BENCH.md's "Incremental dedup" section.

The claim under test is the module's whole point (operators/
minhash_index.py): once a corpus is indexed, deduplicating a NEW crawl
batch costs work proportional to the batch, not the corpus. A shop
re-deduplicating from scratch per snapshot pays O(corpus) every time;
the index path pays O(corpus) once (build) and O(batch + collisions)
per snapshot.

Protocol (synthetic v2 pages, deterministic):
  corpus  = n docs (the already-ingested crawl)
  batch   = n/10 docs: half fresh, half near-clones of indexed docs
  leg A   = near_duplicates_minhash(corpus ∪ batch)   [from-scratch]
  leg B   = build_minhash_index(corpus)               [one-time cost]
  leg C   = query_minhash_index(batch)                [per-snapshot]
  checks  = C's cross pairs ⊆ A's pairs restricted to cross (recall
            printed; both use identical sketch code so any gap is
            banding randomness, not drift), no persistent RDDs leaked.

Usage: python tools/incremental_dedup_bench.py [n_docs]
       python tools/incremental_dedup_bench.py [n_docs] --rolling [k]

--rolling k: the steady-state simulation — build on the corpus, then
k successive snapshots of n/10 fresh docs each run query THEN append
(the production loop). Reports per-snapshot query+append seconds
against the growing index: the claim under test is that per-snapshot
cost tracks the BATCH (plus its collisions), not the index size — the
property that makes the index the right tool at 100 TB.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_quality_checker_spark import get_spark
from data_quality_checker_spark.operators import dedup as DD
from data_quality_checker_spark.operators import minhash_index as MI
from data_quality_checker_spark.plans import synth

THRESHOLD = 0.8


def rolling(n: int, k: int) -> None:
    """k query→append snapshot cycles against a growing index."""
    root = f"/tmp/dqc_incr_rolling_{n}_{k}"
    spark = get_spark(
        "dqc-incremental-rolling", master="local[32]",
        shuffle_partitions=256,
    )
    spark.sparkContext.setLogLevel("ERROR")
    snap = n // 10
    need = n + k * snap
    pages_path = f"{root}/pages"
    if not os.path.exists(f"{pages_path}/_SUCCESS"):
        (
            # over-generate ~5%: the v2 mix emits ~2% null-text rows
            # (filtered below) — without the margin the LAST snapshot
            # window runs short of rows and mis-measures (and at large
            # k would be empty)
            synth.pages_df_distributed(
                spark, int(need * 1.05) + 1_000, seed=42
            )
            .filter("text is not null")
            .select(F.xxhash64("url").alias("doc_id"), "text")
            .limit(need)
            .repartition(64)
            .write.mode("overwrite")
            .parquet(pages_path)
        )
    # bench-only corpus splitter: one global row_number window over
    # the synthetic corpus — never a production pattern. Each split is
    # MATERIALIZED to parquet OUTSIDE the timers: the single-task
    # global sort costs O(corpus) and would otherwise contaminate the
    # exact claim under test (per-snapshot cost tracks the batch, not
    # the corpus).
    pages = spark.read.parquet(pages_path).withColumn(
        "_rk", F.row_number().over(Window.orderBy("doc_id"))
    )
    base_path = f"{root}/base"
    if not os.path.exists(f"{base_path}/_SUCCESS"):
        pages.filter(F.col("_rk") <= n).drop("_rk").repartition(
            64
        ).write.mode("overwrite").parquet(base_path)
    for i in range(k):
        sp = f"{root}/snap{i}"
        if not os.path.exists(f"{sp}/_SUCCESS"):
            lo, hi = n + i * snap, n + (i + 1) * snap
            pages.filter(
                (F.col("_rk") > lo) & (F.col("_rk") <= hi)
            ).drop("_rk").repartition(16).write.mode(
                "overwrite"
            ).parquet(sp)
    base = spark.read.parquet(base_path)

    shutil.rmtree(f"{root}/index", ignore_errors=True)
    t0 = time.time()
    info = MI.build_minhash_index(
        base, f"{root}/index", id_col="doc_id", text_col="text"
    )
    print(
        f"build: {info['n_docs']} docs in {time.time() - t0:.1f}s",
        flush=True,
    )
    indexed = info["n_docs"]
    for i in range(k):
        batch = spark.read.parquet(f"{root}/snap{i}")
        t0 = time.time()
        res = MI.query_minhash_index(
            batch, f"{root}/index", threshold=0.8,
            id_col="doc_id", text_col="text",
        )
        n_pairs = res.count()
        t_q = time.time() - t0
        DD.release_cache(res)
        t0 = time.time()
        app = MI.append_minhash_index(
            batch, f"{root}/index", id_col="doc_id", text_col="text"
        )
        t_a = time.time() - t0
        indexed += app["n_appended"]
        print(
            f"snapshot {i + 1}/{k}: index={indexed} docs, "
            f"batch={app['n_appended']}, query {t_q:.1f}s "
            f"({n_pairs} pairs), append {t_a:.1f}s",
            flush=True,
        )
    leaked = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    print(f"persistent RDDs after runs: {len(leaked)}")


def main() -> None:
    # parse the flag FIRST: n_docs is optional, so argv[1] may BE the
    # flag ('--rolling 4' without n_docs must not int('--rolling'))
    args = list(sys.argv[1:])
    k = 4
    if "--rolling" in args:
        i = args.index("--rolling")
        tail = args[i + 1 : i + 2]
        if tail and not tail[0].startswith("--"):
            k = int(tail[0])
            del args[i : i + 2]
        else:
            del args[i : i + 1]
        n = int(args[0]) if args else 500_000
        rolling(n, k)
        return
    n = int(args[0]) if args else 500_000
    root = f"/tmp/dqc_incr_dedup_{n}"
    spark = get_spark(
        "dqc-incremental-dedup", master="local[32]",
        shuffle_partitions=256,
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"{root}/corpus"
    batch_path = f"{root}/batch"
    if not os.path.exists(f"{batch_path}/_SUCCESS"):
        pages = (
            synth.pages_df_distributed(spark, n + n // 20, seed=42)
            .filter("text is not null")
            .select(
                F.xxhash64("url").alias("doc_id"), "url", "text"
            )
        )
        pages.filter(f"pmod(doc_id, 21) < 20").limit(n).repartition(
            64
        ).write.mode("overwrite").parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        fresh = pages.join(
            corpus.select("doc_id"), "doc_id", "left_anti"
        ).limit(n // 20)
        clones = (
            corpus.filter("pmod(doc_id, 10) = 3")
            .limit(n // 20)
            .select(
                F.xxhash64("url", F.lit("clone")).alias("doc_id"),
                F.concat(F.lit("clone://"), F.col("url")).alias("url"),
                F.concat(
                    F.col("text"),
                    F.lit(" appended crawl tail marker tokens"),
                ).alias("text"),
            )
        )
        fresh.select("doc_id", "url", "text").unionByName(
            clones
        ).repartition(16).write.mode("overwrite").parquet(batch_path)
    corpus = spark.read.parquet(corpus_path)
    batch = spark.read.parquet(batch_path)
    n_corpus, n_batch = corpus.count(), batch.count()
    print(f"corpus={n_corpus} batch={n_batch}", flush=True)

    # leg A: from-scratch batch dedup over corpus ∪ batch
    shutil.rmtree(f"{root}/full", ignore_errors=True)
    t0 = time.time()
    full = DD.near_duplicates_minhash(
        corpus.unionByName(batch),
        id_col="doc_id",
        text_col="text",
        threshold=THRESHOLD,
        storage_path=f"{root}/full",
    )
    full.write.mode("overwrite").parquet(f"{root}/full_pairs")
    t_full = time.time() - t0
    n_full = spark.read.parquet(f"{root}/full_pairs").count()
    print(
        f"A from-scratch dedup: {n_full} pairs in {t_full:.1f}s "
        f"({(n_corpus + n_batch) / t_full:.0f} docs/s)",
        flush=True,
    )

    # leg B: one-time index build over the corpus
    shutil.rmtree(f"{root}/index", ignore_errors=True)
    t0 = time.time()
    info = MI.build_minhash_index(
        corpus, f"{root}/index", id_col="doc_id", text_col="text"
    )
    t_build = time.time() - t0
    print(
        f"B index build: {info['n_docs']} docs in {t_build:.1f}s "
        f"({info['n_docs'] / t_build:.0f} docs/s)",
        flush=True,
    )

    # leg C: per-snapshot incremental query (the steady-state cost)
    t0 = time.time()
    res = MI.query_minhash_index(
        batch,
        f"{root}/index",
        threshold=THRESHOLD,
        id_col="doc_id",
        text_col="text",
        include_within_batch=True,
    )
    res.write.mode("overwrite").parquet(f"{root}/incr_pairs")
    t_query = time.time() - t0
    DD.release_cache(res)
    incr = spark.read.parquet(f"{root}/incr_pairs")
    n_incr = incr.count()
    n_cross = incr.filter("pair_type = 'index-new'").count()
    print(
        f"C incremental query: {n_incr} pairs ({n_cross} cross) in "
        f"{t_query:.1f}s ({n_batch / t_query:.0f} batch docs/s) — "
        f"{t_full / t_query:.1f}x faster than from-scratch",
        flush=True,
    )

    # recall of the incremental path vs the from-scratch run's pairs
    # touching the batch (identical sketch code; gap = 0 expected)
    full_pairs = spark.read.parquet(f"{root}/full_pairs")
    batch_ids = batch.select(F.col("doc_id").alias("bid"))
    full_batch_pairs = (
        full_pairs.join(
            batch_ids.hint("broadcast"),
            (F.col("id_a") == F.col("bid"))
            | (F.col("id_b") == F.col("bid")),
            "left_semi",
        )
    ).select(
        F.least("id_a", "id_b").alias("x"),
        F.greatest("id_a", "id_b").alias("y"),
    ).distinct()
    incr_norm = incr.select(
        F.least("id_index", "id_new").alias("x"),
        F.greatest("id_index", "id_new").alias("y"),
    ).distinct()
    n_truth = full_batch_pairs.count()
    n_hit = full_batch_pairs.join(incr_norm, ["x", "y"], "inner").count()
    print(
        f"parity: {n_hit}/{n_truth} of from-scratch batch-touching "
        f"pairs found incrementally "
        f"(recall {n_hit / max(n_truth, 1):.4f})",
        flush=True,
    )
    leaked = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    print(f"persistent RDDs after runs: {len(leaked)}")


if __name__ == "__main__":
    main()
