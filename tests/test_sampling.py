"""Deterministic sampling / data mixing (plans/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.plans.sampling import (
    hash_frac_predicate,
    sample_fractions,
    weighted_sample,
)


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_hash_frac_deterministic_and_nested(spark):
    df = spark.range(2000).withColumnRenamed("id", "id")
    k30 = _ids(df.filter(hash_frac_predicate(F.col("id"), 0.3)))
    k30b = _ids(df.filter(hash_frac_predicate(F.col("id"), 0.3)))
    k60 = _ids(df.filter(hash_frac_predicate(F.col("id"), 0.6)))
    assert k30 == k30b                       # rerun-stable
    assert set(k30) <= set(k60)              # nested samples
    assert 0.2 < len(k30) / 2000 < 0.4
    assert 0.5 < len(k60) / 2000 < 0.7
    # p >= 1 keeps everything (the 14-char printf edge)
    assert len(_ids(df.filter(hash_frac_predicate(F.col("id"), 1.0)))) == 2000
    # p <= 0 keeps nothing
    assert not _ids(df.filter(hash_frac_predicate(F.col("id"), 0.0)))


def test_sample_fractions_mix(spark):
    rows = [(i, f"src{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sample_fractions(
        df, {"src0": 1.0, "src1": 0.25}, default_frac=0.0
    )
    got = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    assert by_src.get("src0") == 1000
    assert 150 < by_src.get("src1", 0) < 350
    assert "src2" not in by_src and "src3" not in by_src
    # no shuffle: the mix is a pure filter over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_sample_upsamples_heavy_rows(spark):
    # weight 10 vs 1: heavy rows should be kept ~10x as often
    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_sample(df, "w", target_frac=0.2)
    kept = out.collect()
    heavy = sum(1 for r in kept if r["w"] == 10.0)
    light = len(kept) - heavy
    assert 0.15 < len(kept) / 4000 < 0.25      # expected fraction
    assert heavy > 5 * max(light, 1)           # ~10x bias
    # determinism
    assert sorted(r["doc_id"] for r in kept) == sorted(
        r["doc_id"] for r in weighted_sample(df, "w", 0.2).collect()
    )


def test_weighted_sample_degenerate(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 0.0), (3, -1.0)], ["doc_id", "w"]
    )
    assert weighted_sample(df, "w", 0.5).count() == 0


def test_sampling_predicate_works_on_streams(spark, tmp_path_factory):
    """The hash predicate is a stateless filter, so the same mix runs
    unchanged on a readStream (availableNow) with batch parity."""
    d = str(tmp_path_factory.mktemp("stream_mix"))
    rows = [(i, f"src{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    df.write.parquet(f"{d}/in")
    fracs = {"src0": 1.0, "src1": 0.4}
    batch_ids = sorted(
        r["doc_id"]
        for r in sample_fractions(
            spark.read.parquet(f"{d}/in"), fracs
        ).collect()
    )
    stream = spark.readStream.schema("doc_id long, source string").parquet(
        f"{d}/in"
    )
    q = (
        sample_fractions(stream, fracs)
        .writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{d}/out").collect()
    )
    assert stream_ids == batch_ids


def test_plan_mixture(spark):
    import pytest
    from pyspark.sql import functions as F

    from data_quality_checker_spark.plans.sampling import plan_mixture

    df = spark.range(1000).select(
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "books")
        .otherwise("code")
        .alias("source"),
        (F.col("id") % 100 + 1).alias("n_tokens"),
    )
    plan = {
        r["source"]: r
        for r in plan_mixture(
            df, {"web": 2.0, "books": 1.0}, budget_tokens=20_000
        ).collect()
    }
    # code has weight 0 -> planned out but still listed
    assert plan["code"]["fraction"] == 0.0
    assert plan["code"]["expected_tokens"] == 0
    # weights normalized 2:1
    assert abs(plan["web"]["weight"] - 2 / 3) < 1e-12
    # books target may exceed its supply -> capped at 1.0
    for s in ("web", "books"):
        assert 0.0 < plan[s]["fraction"] <= 1.0
        assert (
            plan[s]["expected_tokens"]
            <= plan[s]["available_tokens"]
        )
    # full budget >> supply: every weighted source caps at 1.0
    big = {
        r["source"]: r
        for r in plan_mixture(
            df, {"web": 1.0, "books": 1.0}, budget_tokens=10**9
        ).collect()
    }
    assert big["web"]["fraction"] == 1.0 == big["books"]["fraction"]
    with pytest.raises(ValueError):
        plan_mixture(df, {"nope": 1.0}, budget_tokens=100)
    with pytest.raises(ValueError):
        plan_mixture(df, {}, budget_tokens=100)
    # a negative weight passes the sum check but would starve its
    # source via a negative fraction; NaN/inf pass both checks and
    # die later as an opaque int(nan) -> all must raise loudly
    with pytest.raises(ValueError, match="finite and >= 0"):
        plan_mixture(df, {"web": -1.0, "books": 4.0}, budget_tokens=100)
    with pytest.raises(ValueError, match="finite and >= 0"):
        plan_mixture(
            df, {"web": float("nan"), "books": 1.0}, budget_tokens=100
        )
    with pytest.raises(ValueError, match="finite and >= 0"):
        plan_mixture(
            df, {"web": float("inf"), "books": 1.0}, budget_tokens=100
        )


def test_plan_mixture_null_source(spark):
    """Rows with NULL source (routine missing crawl metadata) must not
    crash planning; they surface as a '<NULL>' row with weight /
    fraction 0 so the excluded volume is visible."""
    from pyspark.sql import functions as F

    from data_quality_checker_spark.plans.sampling import plan_mixture

    df = spark.range(300).select(
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "books")
        .alias("source"),  # id % 3 == 2 -> NULL source
        (F.col("id") % 50 + 1).alias("n_tokens"),
    )
    plan = {
        r["source"]: r
        for r in plan_mixture(
            df, {"web": 1.0, "books": 1.0}, budget_tokens=1_000
        ).collect()
    }
    assert set(plan) == {"web", "books", "<NULL>"}
    null_row = plan["<NULL>"]
    assert null_row["weight"] == 0.0 == null_row["fraction"]
    assert null_row["expected_tokens"] == 0
    # the excluded volume is reported, not hidden
    assert null_row["available_tokens"] > 0


def test_stride_sample_key_col_rejects_null_keys(spark):
    """NULL keys would all hash the identical constant (concat_ws
    skips nulls) and be drawn all-or-nothing — the draw validates and
    fails fast instead (review r5)."""
    import pytest

    from data_quality_checker_spark.plans.sampling import (
        stride_sample_column,
    )

    df = spark.createDataFrame(
        [(float(i), f"k{i}" if i % 3 else None) for i in range(60)],
        "v double, k string",
    )
    with pytest.raises(ValueError, match="NULL"):
        stride_sample_column(df, "v", target=10, key_col="k")
    # non-null keys still work and are deterministic
    a = stride_sample_column(df.filter("k is not null"), "v", 10, key_col="k")
    b = stride_sample_column(
        df.filter("k is not null").repartition(7), "v", 10, key_col="k"
    )
    assert a == b and len(a) == 10
