"""Byte-stability pin for the distributed benchmark corpus generator.

Every BENCH.md number (round-over-round headline deltas, the scaling
pairs, streaming parity checksums) assumes pages_df_distributed
produces THE SAME BYTES for the same (n, seed, corpus_version) across
refactors. The r5 rewrite (unrolled concat_ws -> transform over a
position sequence, to stop janino's 64 KB method-limit fallback on
every generation job) was verified digest-identical against the old
form at n=4000; these golden digests keep any future change honest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.plans import synth

GOLDEN = {
    "v2": "a028bfbb309278bb9b5209210966fd9b",
    "v1": "15e7896cc2dd969885a16da93c8ce2f1",
}


def _digest(df):
    row_h = F.md5(
        F.concat_ws(
            "|",
            "url",
            F.col("warc_ts").cast("string"),
            F.coalesce(F.col("text"), F.lit("<N>")),
            F.md5(F.col("html").cast("string")),
        )
    )
    return (
        df.select(row_h.alias("h"))
        .agg(
            F.md5(
                F.concat_ws(",", F.sort_array(F.collect_list("h")))
            ).alias("d")
        )
        .head()["d"]
    )


def test_corpus_digests_pinned(spark):
    for version, want in GOLDEN.items():
        df = synth.pages_df_distributed(
            spark, 500, seed=42, corpus_version=version
        )
        assert _digest(df) == want, (
            f"corpus_version={version} changed bytes — every BENCH.md "
            f"anchor and streaming parity checksum just silently "
            f"diverged from past rounds; if the change is intentional, "
            f"re-anchor BENCH.md and update this golden"
        )


def test_corpus_class_mix_shapes(spark):
    """The violation classes exist in the mix (v2): nulls, empties,
    long docs, dup-line docs — the generator's contract with the
    pipeline benches."""
    df = synth.pages_df_distributed(spark, 2_000, seed=42).cache()
    try:
        n = df.count()
        assert n == 2_000
        assert df.filter("text is null").count() > 0
        assert df.filter("text = ''").count() > 0
        # long-doc class: ~5k words
        assert (
            df.filter(
                F.size(F.split(F.col("text"), " ")) > 4_000
            ).count()
            > 0
        )
        # dup-line class: repeated identical lines
        assert (
            df.filter(
                F.col("text").contains("\n")
                & (
                    F.size(F.split(F.col("text"), "\n"))
                    > F.size(
                        F.array_distinct(F.split(F.col("text"), "\n"))
                    )
                )
            ).count()
            > 0
        )
    finally:
        df.unpersist()
