"""Sustained throughput for the round-4 operators at corpus scale
(the per-operator evidence table BENCH.md carries for each round's
additions): real BMP/WAV content decode, PSL-aware URL filtering,
applied spelling correction (zero-shuffle map path), and
averaged-perceptron POS scoring — each over 500k-800k rows on
local[$SPARK_GRAFT_CPUS]. Prints one JSON line."""

from __future__ import annotations

import json
import os
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _pages_parquet
from data_quality_checker_spark.session import get_spark


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "dqc-r4-sustained",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "r4_operator_sustained", "cpus": cpus}

    # --- multimodal content decode: 500k synthetic media payloads ---
    from data_quality_checker_spark.operators import multimodal as M

    n_media = 500_000
    media = M.attach_synth_media(
        spark.range(n_media).repartition(256).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
    )
    t0 = time.time()
    feats = M.extract_media_features(media, decoder=M.content_decode)
    agg = feats.agg(
        F.count(F.lit(1)),
        F.avg("lum_mean"),
        F.avg("rms"),
        F.sum(F.col("clip_frac").isNotNull().cast("long")),
    ).collect()[0]
    dt = time.time() - t0
    assert agg[0] == n_media
    out["content_decode"] = {
        "rows": n_media,
        "sec": round(dt, 2),
        "rows_per_sec": round(n_media / dt, 1),
        "note": "synth BMP/WAV built AND decoded in the same pass",
    }

    # --- PSL url filtering: registrable_domain + flags, 800k urls ---
    from data_quality_checker_spark.plans import urlfilter as UF

    in_dir, n_docs = _pages_parquet(spark, 0.1)
    pages = spark.read.parquet(in_dir)
    urls = pages.select("url")
    t0 = time.time()
    flags = UF.url_quality_flags("url", blocked_words=("casino",))
    # aggregate over EVERY flag: referencing only one would let
    # Catalyst's column pruning drop the other three from the physical
    # plan and the leg would not time the work it claims to
    n_dom = (
        urls.select(
            UF.registrable_domain("url").alias("d"),
            *[v.alias(k) for k, v in flags.items()],
        )
        .agg(
            F.countDistinct("d"),
            *[F.sum(F.col(k).cast("long")) for k in flags],
        )
        .collect()[0][0]
    )
    dt = time.time() - t0
    out["psl_url_filter"] = {
        "rows": n_docs,
        "distinct_domains": n_dom,
        "sec": round(dt, 2),
        "rows_per_sec": round(n_docs / dt, 1),
    }

    # --- applied spelling (map path): 800k docs, planted typo ---
    from data_quality_checker_spark.operators import spelling as SP
    from data_quality_checker_spark.operators.dedup import release_cache

    # plant the typo in 0.1% of docs: ~780 occurrences stays BELOW
    # min_freq=1000, so 'teh' is out-of-vocabulary (a 1% plant put it
    # IN the self-derived vocab and the leg silently corrected nothing)
    docs = pages.filter("text is not null").select(
        "url",
        F.concat(
            F.col("text"),
            F.when(F.xxhash64("url") % 1000 == 0, F.lit(" teh"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    from data_quality_checker_spark.functions.text import tokens as T

    planted = F.array_contains(T("text"), "teh")
    n_planted = docs.filter(planted).count()
    # leg A: BUILD the suggestion table (tokenize + delete-key join +
    # window) and pin it, so leg B times only the map application
    t0 = time.time()
    sugg = SP.spelling_suggestions(docs, min_freq=1000).persist()
    n_sugg = sugg.count()
    build_sec = time.time() - t0
    t0 = time.time()
    corrected = SP.with_corrected_text(
        docs, sugg, id_col="url", strategy="map"
    )
    # corrected = docs whose planted typo token is GONE after the map
    # (comparing against lower(text) counts whitespace normalization,
    # not corrections)
    n_changed = corrected.filter(
        planted
        & ~F.array_contains(F.split("text_corrected", " "), "teh")
    ).count()
    dt = time.time() - t0
    n_text = docs.count()
    sugg.unpersist()
    release_cache(corrected)
    assert n_changed == n_planted, (n_changed, n_planted)
    out["spelling_applied_map"] = {
        "rows": n_text,
        "suggestion_build_sec": round(build_sec, 2),
        "suggestion_entries": n_sugg,
        "sec": round(dt, 2),
        "rows_per_sec": round(n_text / dt, 1),
        "docs_planted": n_planted,
        "docs_corrected": n_changed,
    }

    # --- MinHash near-dedup sketch: classic vs one-permutation ---
    # pipeline-faithful input: near-dedup runs AFTER the rule battery,
    # on kept docs only (the repetitive violation classes would
    # otherwise flood the band buckets with template pairs — that
    # ordering is the pipeline's own design, so the leg mirrors it).
    # Same banding/verify both legs; only the signature estimator
    # differs, so the delta is the sketch-phase hash cost.
    from data_quality_checker_spark.operators import dedup as DD
    from data_quality_checker_spark.plans.pipeline import score_pages

    kept = (
        score_pages(pages)
        .filter("keep")
        .select("url", "text")
        .persist()
    )
    n_kept = kept.count()

    def neardup_leg(oph: bool) -> dict:
        t0 = time.time()
        pairs = DD.near_duplicates_minhash(
            kept, id_col="url", threshold=0.85, one_permutation=oph
        )
        n_pairs = pairs.count()
        dt = time.time() - t0
        DD.release_cache(pairs)
        return {
            "rows": n_kept,
            "sec": round(dt, 2),
            "rows_per_sec": round(n_kept / dt, 1),
            "pairs": n_pairs,
        }

    out["neardup_classic"] = neardup_leg(False)
    out["neardup_oph"] = neardup_leg(True)
    kept.unpersist()

    # --- POS perceptron scoring: model trained once, 800k docs ---
    from data_quality_checker_spark.plans import postagger as P

    payload = P.train_pos_perceptron(
        docs, text_col="text", sample_docs=500, n_iter=3, seed=42
    )
    model_path = "/tmp/dqc_r4_pos_model.json.gz"
    P.write_pos_model(model_path, payload)
    spark.sparkContext.addFile(model_path)
    t0 = time.time()
    dist = P.pos_distribution_model(docs, model_path, text_col="text")
    n_tags = dist.agg(F.sum("n")).collect()[0][0]
    dt = time.time() - t0
    out["pos_model_scoring"] = {
        "docs": n_text,
        "tokens_tagged": int(n_tags),
        "sec": round(dt, 2),
        "docs_per_sec": round(n_text / dt, 1),
        "tokens_per_sec": round(n_tags / dt, 1),
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
