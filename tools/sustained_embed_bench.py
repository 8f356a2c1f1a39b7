"""Sustained text->embedding bridge at corpus scale — evidence that
semantic dedup FROM RAW TEXT (plans/embed.hashed_doc_vectors ->
operators/semdedup) holds its shape when the corpus grows: the
synthetic pages corpus (plans/synth — the bench pipeline's own
generator) plus planted exact-text clones (url-suffixed copies whose
hashed TF-IDF vectors are identical, cosine exactly 1.0).

Measures, per stage:
 - embed wall (tokenize -> md5 buckets -> TF-IDF -> dense assembly ->
   L2 norm; two narrow shuffles) and vectors/s;
 - end-to-end semantic_dedup_text wall and docs/s on the DEFAULT
   path (exact_group=True — the production timing; note the planted
   exact clones are collapsed by the text grouping there, BEFORE any
   vector work);
 - a second e2e leg with exact_group=False whose planted recall
   exercises the VECTOR path: each clone must be dropped by the tau
   pairing itself (identical vector -> same argmax cell -> cosine
   1.0 >= tau -> loses the min-url tie), so a broken assignment or
   pair stage reads as recall < 1 here — the grouped leg could never
   show it. Clones are drawn from TOKEN-BEARING docs only (a
   token-less text embeds to the zero vector, which the norm guard
   passes through unpaired by design). Expect exactly 1.0 on BOTH
   legs;
 - kept count (<= n_docs: the synthetic corpus carries its own
   template-level near-dups, which the run collapses too).

Prints one JSON line for BENCH.md's hand-written section.
Usage: python tools/sustained_embed_bench.py [n_docs] [dim] [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_quality_checker_spark.plans import embed as E
from data_quality_checker_spark.plans import synth
from data_quality_checker_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    n_clones = n_docs // 20
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    work = f"/tmp/dqc_embed_v2_{n_docs}"
    spark = get_spark(
        "dqc-embed-sustained",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"{work}/corpus"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        from data_quality_checker_spark.functions.text import tokens

        base = synth.pages_df_distributed(spark, n_docs, seed=42).select(
            F.col("url").alias("doc_id"), "text"
        )
        # md5-ordered draw (not limit: partition-order picks are not
        # retry-stable) of token-BEARING docs — token-less texts embed
        # to the zero vector, which the norm guard passes through
        # unpaired by design and would mis-score planted recall
        clones = (
            base.filter(F.size(tokens("text")) > 0)
            .orderBy(F.md5("doc_id"))
            .limit(n_clones)
            .select(
                F.concat(F.col("doc_id"), F.lit("#clone")).alias(
                    "doc_id"
                ),
                "text",
            )
        )
        base.unionByName(clones).repartition(256).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    n_total = docs.count()

    # stage 1: embed only (consumer reads the vectors, no agg pruning)
    t0 = time.time()
    vecs = E.hashed_doc_vectors(docs, dim=dim)
    n_vec = vecs.select("doc_id", F.element_at("embedding", 1)).count()
    embed_wall = time.time() - t0

    def _release(df):
        for dep in getattr(df, "_cached_deps", ()):
            try:
                dep.unpersist()
            except Exception:
                pass

    # stage 2: end to end, DEFAULT path (production timing; clones
    # are collapsed by the exact-text grouping before vector work)
    t0 = time.time()
    kept = E.semantic_dedup_text(
        docs, dim=dim, k=k, tau=0.999, keep="min_id", impl="arrow"
    )
    n_kept = kept.count()
    e2e_wall = time.time() - t0
    clones_kept = kept.filter(
        F.col("doc_id").endswith("#clone")
    ).count()
    _release(kept)

    # stage 3: vector-path recall — exact_group=False, so every clone
    # must be dropped by the tau pairing itself
    t0 = time.time()
    kept_u = E.semantic_dedup_text(
        docs, dim=dim, k=k, tau=0.999, keep="min_id", impl="arrow",
        exact_group=False,
    )
    n_kept_u = kept_u.count()
    e2e_u_wall = time.time() - t0
    clones_kept_u = kept_u.filter(
        F.col("doc_id").endswith("#clone")
    ).count()
    _release(kept_u)
    print(
        json.dumps(
            {
                "n_total": n_total,
                "n_clones": n_clones,
                "dim": dim,
                "k": k,
                "embed_wall_s": round(embed_wall, 2),
                "embed_vectors_per_s": int(n_vec / embed_wall),
                "e2e_wall_s": round(e2e_wall, 2),
                "e2e_docs_per_s": int(n_total / e2e_wall),
                "n_kept": n_kept,
                "clones_kept": clones_kept,
                "e2e_ungrouped_wall_s": round(e2e_u_wall, 2),
                "n_kept_ungrouped": n_kept_u,
                "vector_path_recall": round(
                    1.0 - clones_kept_u / n_clones, 4
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
