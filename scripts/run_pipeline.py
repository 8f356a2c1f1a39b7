"""spark-submit entry point for the web-text quality pipeline.

    spark-submit --py-files dqc.zip scripts/run_pipeline.py \
        --input /path/pages_parquet --output /path/out \
        --buckets 4096 --run-id nightly-42 [--synth N]

Resumable: re-running with the same --output anti-joins the lineage
table and processes only incomplete partitions (plans/pipeline.py).
Packaging: `python scripts/package.py` zips the library for
--py-files."""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="pages parquet/Iceberg path")
    p.add_argument("--output", required=True, help="output root")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--run-id", default="run-0")
    p.add_argument(
        "--synth",
        type=int,
        default=0,
        help="generate N synthetic pages instead of reading --input",
    )
    p.add_argument(
        "--langid",
        choices=["sql", "udf"],
        default="sql",
        help="heuristic Catalyst langid vs pandas-UDF (fastText-ready)",
    )
    p.add_argument(
        "--extract-from-html",
        action="store_true",
        help="derive the text column from the html BINARY column "
        "(plans/extract.py) before scoring — for corpora shipping "
        "markup only",
    )
    p.add_argument(
        "--near-dedup",
        action="store_true",
        help="MinHash near-dup clustering over kept docs: adds "
        "near_dup_of + keep_final columns",
    )
    p.add_argument(
        "--semantic-dedup",
        action="store_true",
        help="SemDeDup semantic dedup over kept docs FROM TEXT ALONE "
        "(hashed TF-IDF doc vectors, plans/embed.py): adds sem_dup_of "
        "and folds into keep_final; composes with --near-dedup",
    )
    p.add_argument("--semantic-tau", type=float, default=0.97)
    p.add_argument(
        "--url-prefilter",
        action="store_true",
        help="drop urls failing shape heuristics (asset extensions, "
        "raw-IP hosts, oversized queries) before any text is parsed",
    )
    p.add_argument(
        "--block-domains",
        help="parquet path of a domain blocklist (domain column): "
        "broadcast anti-join on registrable domain (implies "
        "--url-prefilter)",
    )
    p.add_argument(
        "--max-docs-per-host",
        type=int,
        help="cap per-host contributions (windowless deterministic "
        "md5-threshold form; implies --url-prefilter)",
    )
    p.add_argument(
        "--c4-line-clean",
        action="store_true",
        help="C4 line-level cleaning before the rule battery "
        "(plans/lineclean.py): edits lines, preserves text_raw "
        "(scrubbed), gates keep on the page flags",
    )
    p.add_argument(
        "--gopher-signals",
        action="store_true",
        help="Gopher MassiveWeb document signals (plans/gopher.py): "
        "adds the signal columns and gates keep on gopher_keep",
    )
    p.add_argument(
        "--quality-model",
        help="path of a trained quality-classifier PipelineModel "
        "(plans/quality_model.py): adds a quality_prob column to the "
        "scored output",
    )
    p.add_argument(
        "--decontaminate-eval",
        help="parquet path of an eval/benchmark corpus (text column): "
        "flags kept docs sharing an exact 13-gram with it "
        "(contaminated column, folded into keep_final)",
    )
    args = p.parse_args()

    from data_quality_checker_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from data_quality_checker_spark.plans.rules import RuleConfig
    from data_quality_checker_spark.session import get_spark

    # no master override: spark-submit supplies cluster config
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("dqc-webtext-pipeline")
    spark = builder.getOrCreate() if os.environ.get(
        "SPARK_ENV_LOADED"
    ) else get_spark("dqc-webtext-pipeline")

    if args.synth:
        from data_quality_checker_spark.plans.synth import (
            pages_df_distributed,
        )

        pages = pages_df_distributed(spark, args.synth, seed=42)
    else:
        if not args.input:
            p.error("--input required unless --synth is given")
        pages = spark.read.parquet(args.input)

    if args.extract_from_html:
        from data_quality_checker_spark.plans.extract import (
            with_extracted_text,
        )

        pages = with_extracted_text(
            pages, "html", "text", sep=" ", normalize_whitespace=True
        )

    cfg = PipelineConfig(
        rules=RuleConfig(),
        num_buckets=args.buckets,
        langid_impl=args.langid,
        near_dedup=args.near_dedup,
        semantic_dedup=args.semantic_dedup,
        semantic_dedup_tau=args.semantic_tau,
        url_prefilter=bool(
            args.url_prefilter
            or args.block_domains
            or args.max_docs_per_host
        ),
        max_docs_per_host=args.max_docs_per_host,
        c4_line_clean=args.c4_line_clean,
        gopher_quality=args.gopher_signals,
    )
    decontam_eval = (
        spark.read.parquet(args.decontaminate_eval)
        if args.decontaminate_eval
        else None
    )
    url_blocklist = (
        spark.read.parquet(args.block_domains)
        if args.block_domains
        else None
    )
    result = run_pipeline(
        spark, pages, args.output, cfg, run_id=args.run_id,
        decontam_eval=decontam_eval, url_blocklist=url_blocklist,
        quality_model_path=args.quality_model,
    )
    print(
        f"processed={len(result['processed_partitions'])} "
        f"skipped={result['skipped']} output={args.output}"
    )


if __name__ == "__main__":
    main()
