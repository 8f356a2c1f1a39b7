"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and the pages
pipeline over a deterministic synthetic corpus sized to the SF, then
prints ONE compact JSON headline line (kept under ~500 B so the
driver's output-tail capture always parses it — round 5 lost its
headline to a 2.6 KB line):
  {"metric": ..., "value": <total sec>, "unit": "sec", "sf": ...,
   "cpus": ..., "n_queries": ..., "pipeline_docs_per_sec": ...,
   "pipeline_docs": ..., "detail": "BENCH_DETAIL.json"}
Per-query timings and both interleaved legs are written to
BENCH_DETAIL.json next to this script.

Scaling-proxy runs (north rule: efficiency >= 0.8 from N to 4N):
  SPARK_GRAFT_CPUS=8 python bench.py   vs   SPARK_GRAFT_CPUS=32 ...
tools/scaling_bench.py automates the pair and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from data_quality_checker_spark.session import get_spark
from data_quality_checker_spark.plans import synth
from data_quality_checker_spark.plans.pipeline import (
    PipelineConfig,
    score_pages,
)

def _bench_minhash(spark, sf_dir):
    """Full-corpus production near-dup pairs — the round-1/2 bench
    semantics for this key. (queries()['minhash_neardups'] became a
    bounded ground-truth recall GATE in round 3; the bench keeps
    timing the unbounded operator so round-over-round deltas compare
    like with like.)"""
    from data_quality_checker_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return DD.near_duplicates_minhash(docs, threshold=0.8)


def _bench_simhash(spark, sf_dir):
    """Full-corpus production SimHash pairs (same rationale)."""
    from data_quality_checker_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return DD.near_duplicates_simhash(docs, max_hamming=8)


def _vectors_parquet(spark, cache_root: str = "/tmp/dqc_bench") -> str:
    """Cached 55k-vector clustered synthetic corpus (50k + 5k planted
    clones) for the semantic-dedup headline — the sf fixtures carry
    only 2k mutually-dissimilar embeddings, far below a meaningful
    measurement. Reuses the SAME synthesis as the sustained benches
    (tools/sustained_ann_bench.synth_vectors + the clone idiom from
    tools/sustained_semdedup_bench) so the headline and the 550k
    BENCH.md evidence measure the same geometry; cached keyed on every
    shape parameter so a recipe change can never silently reuse a
    stale corpus (the _pages_parquet convention)."""
    from pyspark.sql import functions as F

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    )
    from sustained_ann_bench import synth_vectors

    n, dim, n_clones, noise = 50_000, 64, 5_000, 0.3
    path = f"{cache_root}/vectors_v2_n{n}_d{dim}_c{n_clones}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        base = synth_vectors(spark, n, dim, noise=noise).withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        clones = base.filter(F.col("vec_id") < n_clones).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(0.02) * x * x
            ).alias("embedding"),
        )
        base.unionAll(clones).repartition(32).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def _bench_semdedup(spark, sf_dir):
    """SemDeDup pair stage at 55k vectors, the arrow (numpy-matmul)
    scale path — k=256 cells, tau=0.95; the sustained 550k evidence
    lives in BENCH.md, this tracks round-over-round movement."""
    from data_quality_checker_spark.operators import semdedup as SD

    vecs = spark.read.parquet(_vectors_parquet(spark))
    return SD.semantic_dedup_pairs(
        vecs, k=256, tau=0.95, dim=64, impl="arrow"
    )


def _bench_embed_dedup(spark, sf_dir):
    """Text->embedding bridge flagship: semantic dedup straight from
    documents(text) — hashed TF-IDF embed (pure Catalyst) -> SemDeDup
    keep set -> semi-join, the end-to-end run a user starts from a
    raw text corpus (no precomputed vectors)."""
    from data_quality_checker_spark.plans import embed as E

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return E.semantic_dedup_text(
        docs, dim=128, k=32, tau=0.95, impl="arrow"
    )


def _bench_spans_cdc(spark, sf_dir):
    """Content-anchored exact-substring dedup, PRODUCTION shape
    (xxhash64 8-byte window keys — the oracle twin uses key_mode='text'
    for engine portability; the bench tracks the shuffle-lean form) on
    the same planted near-copy corpus as the oracle query."""
    from pyspark.sql import functions as F

    from data_quality_checker_spark.operators import dedup as DD
    from data_quality_checker_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter("doc_id % 4 = 0").select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" extra tail words appended here"),
            ).alias("text"),
        )
    )
    return DD.duplicate_spans(
        corpus, window=12, stride=4, key_mode="xxhash64",
        anchor_mode="content",
    )


_INDEX_PARAMS = dict(k_shingle=3, num_hashes=32, num_bands=8, shingle_mode="hash")


def _minhash_index_parquet(spark, sf_dir: str) -> str:
    """One-time MinHash index over the sf documents table (cached per
    (sf_dir, every sketch parameter) — the _vectors_parquet keying
    convention, so a recipe change can never silently reuse a stale
    index — built OUTSIDE the timed legs; the build cost is a
    separately-reported one-time number in BENCH.md's Incremental
    dedup section). The cache sentinel is meta/_SUCCESS: the manifest
    is the LAST table build_minhash_index writes, so an interrupted
    build re-runs instead of wedging every later bench."""
    import hashlib

    from data_quality_checker_spark.operators import minhash_index as MI

    p = _INDEX_PARAMS
    key = (
        f"{sf_dir}|k{p['k_shingle']}_h{p['num_hashes']}"
        f"_b{p['num_bands']}_{p['shingle_mode']}"
    )
    path = (
        "/tmp/dqc_bench/minhash_index_"
        + hashlib.md5(key.encode()).hexdigest()[:12]
    )
    if not os.path.exists(f"{path}/meta/_SUCCESS"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        MI.build_minhash_index(docs, path, **p)
    return path


def _bench_minhash_index(spark, sf_dir):
    """Incremental index query, the steady-state rolling-crawl cost:
    a batch of fresh+cloned docs (~25% of the corpus) against the
    prebuilt index. Times sketch-of-batch + band join + exact verify;
    the index is read, never re-sketched."""
    from pyspark.sql import functions as F

    from data_quality_checker_spark.operators import minhash_index as MI

    path = _minhash_index_parquet(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter("doc_id % 8 = 0").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" appended crawl tail marker tokens"),
        ).alias("text"),
    ).unionByName(
        docs.filter("doc_id % 8 = 1").select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
        )
    )
    return MI.query_minhash_index(
        batch, path, threshold=0.8, include_within_batch=False
    )


BENCH_OVERRIDES = {
    "minhash_neardups": _bench_minhash,
    "simhash_neardups": _bench_simhash,
    "semantic_dedup_pairs": _bench_semdedup,
    "duplicate_spans_cdc": _bench_spans_cdc,
    "minhash_index_incr": _bench_minhash_index,
    "semantic_dedup_text": _bench_embed_dedup,
}

HEADLINE = [
    "pricing_summary",
    "top_parts",
    "order_line_histogram",
    "missing_values",
    "outliers_zscore",
    "rolling_forecast",
    "sessionization",
    "serial_correlation",
    "psi",
    "text_stats",
    "quality_verdict",
    "scrubbed_digest",
    "langid_counts",
    "top_bigrams",
    "tfidf_top1",
    "minhash_neardups",
    "simhash_neardups",
    "ann_topk",
    "multimodal_features",
    # round-2 additions (keys above keep round-over-round comparability)
    "ks_drift",
    "redundancy_structure",
    # round-3 additions: flagship training-data extensions
    "decontamination",
    "line_dedup",
    # round-4 additions: real content decode + applied correction
    "multimodal_content",
    "spelling_applied",
    # round-4 additions: published webtext cleaning stages
    "c4_clean",
    "gopher_signals",
    # round-4 session-2 addition: semantic dedup (SemDeDup), arrow path
    "semantic_dedup_pairs",
    # round-5 addition: content-anchored exact-substring dedup (CDC)
    "duplicate_spans_cdc",
    # round-5 addition: incremental index-backed dedup (steady-state
    # rolling-crawl query against the prebuilt MinHash index)
    "minhash_index_incr",
    # round-6 addition: text->embedding bridge (embed + SemDeDup e2e
    # from raw text; the vector content is oracle-pinned separately
    # by doc_embed_hashing)
    "semantic_dedup_text",
    # round-6 addition: in-repo baseline-JPEG decode through the
    # mapInPandas feature extractor (operators/jpeg.py)
    "multimodal_jpeg",
]


def _sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except Exception:
        return 0.1


def _pages_parquet(
    spark,
    sf: float,
    cache_root: str = "/tmp/dqc_bench",
    corpus_version: str = "v2",
) -> tuple[str, int]:
    """Deterministic synthetic corpus parquet sized to SF; generated
    once per (sf, n, version) — distributed generation (no driver
    loop), written pre-partitioned so every parallelism level can read
    in parallel; generation cost never pollutes timing."""
    n = max(10_000, int(8_000_000 * sf))
    path = f"{cache_root}/pages_{corpus_version}_sf{sf}_n{n}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        (
            synth.pages_df_distributed(
                spark, n, seed=42, corpus_version=corpus_version
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(path)
        )
    return path, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    # fixed task count at every parallelism level: AQE's
    # parallelism-first coalescing otherwise produces ~1.1 waves
    # (straggler-bound) and breaks cross-level comparability
    spark = get_spark(
        "dqc-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    # tiny warmup so JVM/codegen startup isn't billed to the first query
    spark.range(1000).selectExpr("sum(id)").collect()
    # generate the semantic-dedup vector corpus and the MinHash index
    # OUTSIDE the timed legs (the _pages_parquet convention — one-time
    # generation must never pollute a query_legs entry)
    _vectors_parquet(spark)
    _minhash_index_parquet(spark, sf_dir)

    # two INTERLEAVED legs (run the whole list, then run it again) and
    # keep the best per query: single-leg numbers ride ~±20% JVM/codegen
    # noise (observed round-over-round on unchanged plans), and
    # interleaving keeps leg B's JVM state comparable across queries —
    # the same methodology BENCH.md uses for the scaling pairs.
    legs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(2):
        for name in HEADLINE:
            fn = BENCH_OVERRIDES.get(name) or queries[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            legs[name].append(time.time() - t0)
            for dep in getattr(df, "_cached_deps", ()):
                dep.unpersist()  # no cross-query cache accumulation
    for name in HEADLINE:
        timings[name] = round(min(legs[name]), 3)

    # pages pipeline throughput (the north-rule headline number):
    # 2 warmups (codegen/JIT) + best of 5 measured runs — the same
    # best-of-legs convention the queries above use (timeit-style:
    # min is the least-noise estimator of the true cost; single-run
    # numbers vary ~30% across JVMs)
    pages_path, n_pages = _pages_parquet(spark, sf)
    pages = spark.read.parquet(pages_path)
    cfg = PipelineConfig(num_buckets=64)  # fixed shape across levels
    for _ in range(2):  # 2 warmups: C2 JIT on the big codegen methods
        kept = score_pages(pages, cfg).filter("keep").count()
    runs = []
    for _ in range(5):
        t0 = time.time()
        kept = score_pages(pages, cfg).filter("keep").count()
        runs.append(time.time() - t0)
    pipeline_sec = min(runs)
    timings["pages_pipeline"] = round(pipeline_sec, 3)
    docs_per_sec = round(n_pages / pipeline_sec, 1)

    # v1-corpus re-anchor leg (round-3 verdict: cross-round throughput
    # tracking needs a same-corpus baseline after the honest-v2 switch;
    # reported as side-channel fields, NOT in `value`, so the headline
    # total stays comparable round over round)
    v1_path, n_v1 = _pages_parquet(spark, sf, corpus_version="v1")
    pages_v1 = spark.read.parquet(v1_path)
    for _ in range(1):
        score_pages(pages_v1, cfg).filter("keep").count()
    v1_runs = []
    for _ in range(3):
        t0 = time.time()
        score_pages(pages_v1, cfg).filter("keep").count()
        v1_runs.append(time.time() - t0)
    v1_sec = min(v1_runs)

    total = round(sum(timings.values()), 3)
    # Round-5 postmortem: the driver captures only a ~2 KB output tail,
    # and the single JSON line had grown past it (31 queries + 31 legs
    # ≈ 2.6 KB) — BENCH_r05.json recorded `"parsed": null` and the
    # round's headline number was lost. Contract since round 6: stdout
    # carries ONE compact headline line (~300 B, fits any capture
    # window); the per-query timings + both legs go to
    # BENCH_DETAIL.json next to this script (committed per round).
    detail = {
        "queries": timings,
        "query_legs": {
            k: [round(x, 3) for x in v] for k, v in legs.items()
        },
        "sf": sf,
        "cpus": cpus,
        "pipeline_corpus": "v2",
        "pipeline_kept": kept,
        "pipeline_v1_sec": round(v1_sec, 3),
        "pipeline_v1_docs_per_sec": round(n_v1 / v1_sec, 1),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_pipeline_wall_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "cpus": cpus,
                "n_queries": len(timings),
                "pipeline_docs_per_sec": docs_per_sec,
                "pipeline_docs": n_pages,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
