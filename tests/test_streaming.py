"""Streaming parity: the stream path produces exactly the batch path's
results (same rule exprs), and checkpoint restart doesn't duplicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.plans import synth
from data_quality_checker_spark.plans.pipeline import (
    PipelineConfig,
    score_pages,
)
from data_quality_checker_spark.streaming.stream import (
    run_stream_available_now,
)


def _checksum(df):
    return df.select(
        F.sum(
            F.xxhash64("url", "keep", "scrubbed_text").cast("decimal(38,0)")
        )
    ).collect()[0][0]


def test_stream_matches_batch_and_is_exactly_once(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("stream_in"))
    out_dir = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    pages = synth.pages_df(spark, 400, seed=7)
    pages.write.mode("overwrite").parquet(in_dir)

    cfg = PipelineConfig(dedup_latest_capture=False)
    run_stream_available_now(spark, in_dir, out_dir, ckpt, cfg)

    got = spark.read.parquet(out_dir)
    expect = score_pages(spark.read.parquet(in_dir), cfg)
    assert got.count() == expect.count()
    assert _checksum(got) == _checksum(expect)

    # re-run with same checkpoint: no new input -> no duplicates
    run_stream_available_now(spark, in_dir, out_dir, ckpt, cfg)
    assert spark.read.parquet(out_dir).count() == expect.count()


def test_stream_webtext_stages_match_batch(spark, tmp_path_factory):
    """The opt-in C4/Gopher stages are pure projections, so they must
    stream unchanged: availableNow over the same corpus equals the
    batch plan checksum-for-checksum with both stages on."""
    in_dir = str(tmp_path_factory.mktemp("stream_wt_in"))
    out_dir = str(tmp_path_factory.mktemp("stream_wt_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_wt_ckpt"))

    pages = synth.pages_df(spark, 300, seed=11)
    pages.write.mode("overwrite").parquet(in_dir)

    cfg = PipelineConfig(
        dedup_latest_capture=False,
        c4_line_clean=True,
        gopher_quality=True,
    )
    run_stream_available_now(spark, in_dir, out_dir, ckpt, cfg)

    got = spark.read.parquet(out_dir)
    expect = score_pages(spark.read.parquet(in_dir), cfg)
    assert got.count() == expect.count()
    assert _checksum(got) == _checksum(expect)
    # the stage columns are present and the raw text is preserved
    for c in ("c4_keep", "gopher_keep", "text_raw"):
        assert c in got.columns


def test_stream_parity_mid_scale_distributed_corpus(
    spark, tmp_path_factory
):
    """Round-3 verdict item: parity beyond toy fixtures — the full
    12-rule + scrub verdict streamed over a 20k-doc distributed-synth
    v2 corpus (every violation class present, incl. the long-doc and
    dup-lines heavy hitters) equals the batch plan checksum-for-
    checksum; the decontam stream variant agrees with the batch stage
    at the same scale."""
    from data_quality_checker_spark.streaming.stream import (
        run_stream_decontam_available_now,
    )

    d = tmp_path_factory.mktemp("stream_mid")
    in_dir = str(d / "in")
    (
        synth.pages_df_distributed(spark, 20_000, seed=42)
        .repartition(16)
        .write.mode("overwrite")
        .parquet(in_dir)
    )
    cfg = PipelineConfig(dedup_latest_capture=False, num_buckets=16)
    run_stream_available_now(
        spark, in_dir, str(d / "out"), str(d / "ckpt"), cfg
    )
    got = spark.read.parquet(str(d / "out"))
    expect = score_pages(spark.read.parquet(in_dir), cfg)
    assert got.count() == 20_000
    assert _checksum(got) == _checksum(expect)

    # decontam variant: eval = two kept documents' raw text —
    # MATERIALIZED (orderBy + collect) so the streaming leg and the
    # batch comparison see the same eval rows; a lazy unordered
    # limit(2) could pick different docs on each evaluation
    two = (
        expect.filter("keep")
        .select("url", "text")
        .orderBy("url")
        .limit(2)
        .collect()
    )
    eval_df = spark.createDataFrame(
        [(r["text"],) for r in two], "text string"
    )
    run_stream_decontam_available_now(
        spark,
        in_dir,
        str(d / "out_dc"),
        str(d / "ckpt_dc"),
        eval_df,
        cfg,
    )
    from data_quality_checker_spark.plans.pipeline import (
        with_decontam_verdict,
    )

    streamed = spark.read.parquet(str(d / "out_dc"))
    batch = with_decontam_verdict(expect, eval_df, cfg)

    def dc_checksum(df):
        return df.select(
            F.sum(
                F.xxhash64(
                    "url", "keep", "scrubbed_text", "contaminated",
                    "keep_final",
                ).cast("decimal(38,0)")
            )
        ).collect()[0][0]

    assert streamed.count() == 20_000
    assert dc_checksum(streamed) == dc_checksum(batch)
    assert streamed.filter("contaminated").count() >= 2


def test_stream_decontam_matches_batch(spark, tmp_path_factory):
    """Streaming decontamination (foreachBatch vs static eval table)
    produces the same per-url contaminated verdicts as the batch
    stage over the same corpus."""
    from data_quality_checker_spark.plans import synth
    from data_quality_checker_spark.plans.pipeline import (
        PipelineConfig,
        score_pages,
        with_decontam_verdict,
    )
    from data_quality_checker_spark.streaming.stream import (
        run_stream_decontam_available_now,
    )

    d = tmp_path_factory.mktemp("stream_decontam")
    pages = synth.pages_df(spark, 150, seed=23)
    pages.write.mode("overwrite").parquet(f"{d}/in")
    eval_df = (
        spark.read.parquet(f"{d}/in")
        .filter("text is not null")
        .select("text")
        .limit(2)
    )
    cfg = PipelineConfig(dedup_latest_capture=False)
    run_stream_decontam_available_now(
        spark, f"{d}/in", f"{d}/out", f"{d}/ckpt", eval_df, cfg
    )
    streamed = spark.read.parquet(f"{d}/out")
    assert "contaminated" in streamed.columns
    batch = with_decontam_verdict(
        score_pages(spark.read.parquet(f"{d}/in"), cfg), eval_df, cfg
    )
    s = {
        r["url"]: r["contaminated"]
        for r in streamed.select("url", "contaminated").collect()
    }
    b = {
        r["url"]: r["contaminated"]
        for r in batch.select("url", "contaminated").collect()
    }
    assert s == b
    assert sum(s.values()) >= 1


def test_stream_near_dedup_matches_batch(spark, tmp_path_factory):
    """Streaming + near-dedup (VERDICT r04 item 8): availableNow
    scoring followed by the corpus-global MinHash near-dedup post-pass
    must equal the batch score_pages + with_near_dup_verdict
    composition exactly — including which cluster member wins — and
    must actually demote planted near-duplicates."""
    from data_quality_checker_spark.operators.dedup import release_cache
    from data_quality_checker_spark.plans.pipeline import (
        with_near_dup_verdict,
    )
    from data_quality_checker_spark.streaming.stream import (
        run_stream_with_near_dedup_available_now,
    )

    in_dir = str(tmp_path_factory.mktemp("nd_in"))
    out_dir = str(tmp_path_factory.mktemp("nd_out"))
    ckpt = str(tmp_path_factory.mktemp("nd_ckpt"))

    pages = synth.pages_df(spark, 300, seed=13)
    # plant unmistakable near-dups: copies of kept docs under new urls
    # with one appended token (Jaccard >> threshold)
    clones = (
        pages.filter("text is not null and length(text) > 200")
        .limit(20)
        .select(
            F.concat(F.lit("https://clone.example/"), F.md5("url")).alias(
                "url"
            ),
            "warc_ts",
            "html",
            F.concat("text", F.lit(" tail")).alias("text"),
            "lang",
        )
    )
    pages.unionByName(clones).write.mode("overwrite").parquet(in_dir)

    cfg = PipelineConfig(dedup_latest_capture=False, near_dedup=True)
    final_dir = run_stream_with_near_dedup_available_now(
        spark, in_dir, out_dir, ckpt, cfg
    )
    got = spark.read.parquet(final_dir)

    expect = with_near_dup_verdict(
        score_pages(spark.read.parquet(in_dir), cfg), cfg
    )

    def nd_checksum(df):
        return df.select(
            F.sum(
                F.xxhash64(
                    "url",
                    "keep_final",
                    F.coalesce("near_dup_of", F.lit("")),
                ).cast("decimal(38,0)")
            )
        ).collect()[0][0]

    assert got.count() == expect.count()
    assert nd_checksum(got) == nd_checksum(expect)
    # the stage did real work: some keep docs were demoted
    demoted = got.filter("keep and not keep_final").count()
    assert demoted >= 10
    release_cache(expect)
