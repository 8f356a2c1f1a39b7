"""spark-submit entry point for the incremental MinHash dedup index.

    spark-submit --py-files dqc.zip scripts/dedup_index.py build \
        --input /path/corpus_parquet --index /path/index \
        [--num-hashes 32 --num-bands 8 --k-shingle 3 \
         --shingle-mode hash]
    spark-submit --py-files dqc.zip scripts/dedup_index.py query \
        --input /path/new_batch_parquet --index /path/index \
        --output /path/pairs [--threshold 0.8 --within-batch]
    spark-submit --py-files dqc.zip scripts/dedup_index.py append \
        --input /path/new_batch_parquet --index /path/index
    spark-submit --py-files dqc.zip scripts/dedup_index.py filter \
        --input /path/new_batch_parquet --index /path/index \
        --output /path/survivors [--threshold 0.8]
    spark-submit --py-files dqc.zip scripts/dedup_index.py compact \
        --index /path/index --output /path/index_compacted \
        [--target-mb 256]

The rolling-crawl loop is `query` (report the batch's duplicates
against everything ingested) then `append` (make the batch part of
"everything ingested"). Sketch parameters are frozen into the index
manifest at build time; query/append read them back, so there is
nothing to keep in sync between jobs. Packaging: `python
scripts/package.py` zips the library for --py-files.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "action",
        choices=["build", "query", "append", "filter", "compact"],
    )
    p.add_argument("--input", help="parquet path of docs")
    p.add_argument("--index", required=True, help="index root path")
    p.add_argument(
        "--output",
        help="pairs parquet path (query) / compacted index root (compact)",
    )
    p.add_argument("--target-mb", type=int, default=256)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--within-batch", action="store_true")
    p.add_argument(
        "--within-batch-keep-all",
        action="store_true",
        help="filter: drop only index matches, keep within-batch dups",
    )
    p.add_argument("--num-hashes", type=int, default=32)
    p.add_argument("--num-bands", type=int, default=8)
    p.add_argument("--k-shingle", type=int, default=3)
    p.add_argument(
        "--shingle-mode", choices=["hash", "text"], default="hash"
    )
    p.add_argument("--master", default=None, help="override (tests)")
    args = p.parse_args()
    if args.action in ("query", "filter", "compact") and not args.output:
        p.error(f"{args.action} requires --output")
    if args.action != "compact" and not args.input:
        p.error(f"{args.action} requires --input")

    from data_quality_checker_spark.operators import dedup as DD
    from data_quality_checker_spark.operators import minhash_index as MI
    from data_quality_checker_spark.session import get_spark

    spark = get_spark(
        f"dqc-dedup-index-{args.action}",
        **({"master": args.master} if args.master else {}),
    )
    if args.action == "compact":
        stats = MI.compact_minhash_index(
            spark, args.index, args.output, target_mb=args.target_mb
        )
        print(json.dumps({"action": "compact", **stats}), flush=True)
        return
    docs = spark.read.parquet(args.input)
    if args.action == "build":
        info = MI.build_minhash_index(
            docs,
            args.index,
            id_col=args.id_col,
            text_col=args.text_col,
            k_shingle=args.k_shingle,
            num_hashes=args.num_hashes,
            num_bands=args.num_bands,
            shingle_mode=args.shingle_mode,
        )
    elif args.action == "append":
        info = MI.append_minhash_index(
            docs, args.index, id_col=args.id_col, text_col=args.text_col
        )
    elif args.action == "filter":
        survivors = MI.filter_batch_against_index(
            docs,
            args.index,
            threshold=args.threshold,
            id_col=args.id_col,
            text_col=args.text_col,
            drop_within_batch=not args.within_batch_keep_all,
        )
        survivors.write.mode("overwrite").parquet(args.output)
        DD.release_cache(survivors)
        info = {
            "n_in": docs.count(),
            "n_survivors": spark.read.parquet(args.output).count(),
            "output": args.output,
        }
    else:
        pairs = MI.query_minhash_index(
            docs,
            args.index,
            threshold=args.threshold,
            id_col=args.id_col,
            text_col=args.text_col,
            include_within_batch=args.within_batch,
        )
        pairs.write.mode("overwrite").parquet(args.output)
        DD.release_cache(pairs)
        out = spark.read.parquet(args.output)
        info = {
            "n_pairs": out.count(),
            "n_cross": out.filter("pair_type = 'index-new'").count(),
            "output": args.output,
        }
    print(json.dumps({"action": args.action, **info}), flush=True)


if __name__ == "__main__":
    main()
