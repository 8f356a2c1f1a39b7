"""Tests: Holt-Winters, Dickey-Fuller, multimodal detection, schema
validation, Iceberg-gated IO fallback."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.operators import quality as Q
from data_quality_checker_spark.operators import stats as S
from data_quality_checker_spark.operators import temporal as T
from data_quality_checker_spark.sources import io as IO


def test_holt_winters_tracks_seasonal_series(spark):
    base = dt.datetime(2024, 1, 1)
    period = 4
    rows = [
        (
            base + dt.timedelta(hours=i),
            100.0 + 0.5 * i + [8.0, 0.0, -5.0, -3.0][i % period],
            "s",
        )
        for i in range(48)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double, k string")
    fc = {
        r["step"]: r["forecast"]
        for r in T.holt_winters_forecast(
            df, "v", "ts", "k", period=period, steps=4
        ).collect()
    }
    truth = {
        h: 100.0 + 0.5 * (48 + h - 1) + [8.0, 0.0, -5.0, -3.0][(48 + h - 1) % period]
        for h in (1, 2, 3, 4)
    }
    for h in (1, 2, 3, 4):
        assert abs(fc[h] - truth[h]) < 3.0, (h, fc[h], truth[h])
    # seasonal ordering preserved in the forecast
    assert fc[1] - fc[2] > 4  # phase 0 is the high season


def test_dickey_fuller_stationary_vs_random_walk(spark):
    rng = np.random.RandomState(3)
    base = dt.datetime(2024, 1, 1)
    stationary = rng.normal(0, 1, 300)
    walk = np.cumsum(rng.normal(0, 1, 300))
    rows = [
        (base + dt.timedelta(hours=i), float(stationary[i]), "stat")
        for i in range(300)
    ] + [
        (base + dt.timedelta(hours=i), float(walk[i]), "walk")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double, k string")
    stats = {
        r["series"]: r["df_stat"]
        for r in T.dickey_fuller_stat(df, "v", "ts", "k").collect()
    }
    assert stats["stat"] < -5  # strongly stationary
    # walk hovers near the unit-root region; the separation is the signal
    assert stats["walk"] > -3.5
    assert stats["stat"] < stats["walk"] - 3


def test_detect_multimodal(spark):
    rng = np.random.RandomState(4)
    bimodal = np.concatenate(
        [rng.normal(0, 0.5, 800), rng.normal(10, 0.5, 800)]
    )
    uni = rng.normal(5, 1, 1600)
    dfb = spark.createDataFrame([(float(x),) for x in bimodal], "x double")
    dfu = spark.createDataFrame([(float(x),) for x in uni], "x double")
    assert S.detect_multimodal(dfb, "x")["n_peaks"] == 2
    assert S.detect_multimodal(dfu, "x")["n_peaks"] == 1


def test_validate_schema(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    ok = Q.validate_schema(
        df,
        {
            "columns": [
                {"name": "id", "type": "bigint"},
                {"name": "name", "type": "string"},
            ]
        },
    )
    assert ok["valid"] and not ok["unexpected_columns"]
    bad = Q.validate_schema(
        df,
        {
            "columns": [
                {"name": "id", "type": "int"},
                {"name": "missing_col"},
            ]
        },
    )
    assert bad["missing_columns"] == ["missing_col"]
    assert bad["type_mismatches"] == ["id"]
    assert bad["unexpected_columns"] == ["name"]
    assert not bad["valid"]


def test_write_table_parquet_fallback(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("iox")) + "/t1"
    df = spark.createDataFrame([(1,), (2,)], "x long")
    IO.write_table(df, "t1", path=d)
    assert IO.read_table_by_name(spark, "t1", path=d).count() == 2
    with pytest.raises(ValueError):
        IO.write_table(df, "t1")


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Co-bucketed managed tables must join with ZERO Exchange: the
    bucketed scans already satisfy the join distribution (the Iceberg
    bucket(N, key) co-location discipline, io.write_bucketed)."""
    from data_quality_checker_spark.sources import io

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    io.write_bucketed(
        orders, "t_orders_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"]
    )
    io.write_bucketed(
        lineitem, "t_lineitem_b", ["l_orderkey"], 4,
        sort_cols=["l_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = io.read_bucketed(spark, "t_orders_b").join(
            io.read_bucketed(spark, "t_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        n = j.count()
        assert n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists t_orders_b")
        spark.sql("drop table if exists t_lineitem_b")


def test_aqe_splits_skewed_join(spark):
    """The session's AQE skew-join handling must actually fire: a
    sort-merge join against a pathologically hot key gets its skewed
    shuffle partition split at runtime (SortMergeJoin(skew=true) +
    'AQEShuffleRead ... skewed' in the finalized plan) — the runtime
    complement to the pipeline's static host-salting."""
    hot = spark.range(3_000_000).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(5_000).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(51).select(
        F.col("id").alias("k"), F.lit("d").alias("tag")
    )
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        j = hot.union(cold).join(dim, "k").select(
            F.spark_partition_id().alias("p")
        )
        n = j.count()
        j.collect()  # finalize the adaptive plan
        assert n == 3_005_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_py_files_zip_is_importable(tmp_path):
    """scripts/package.py must produce a zip a fresh interpreter can
    import the full package from (the spark-submit --py-files path)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "/root/repo/scripts/package.py"],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    check = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, sys.argv[1]); "
            "import data_quality_checker_spark as d; "
            "from data_quality_checker_spark.plans.rules import RuleConfig; "
            "from data_quality_checker_spark.operators import drift, dedup; "
            "print('IMPORT_OK', RuleConfig().min_chars)",
            zip_path,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: the zip must be self-sufficient
    )
    assert "IMPORT_OK 80" in check.stdout, (check.stdout, check.stderr)


def test_isolation_forest_finds_planted_outliers(spark):
    """Real iForest (Liu et al. 2008): sample-trained driver-side by
    design, scored distributed via the iterator pandas UDF. Planted
    far-out points must rank in the global top-10 with scores well
    above the inlier mean (~0.5 per the paper's normalization)."""
    from data_quality_checker_spark.operators import ml as ML

    rng = np.random.default_rng(3)
    inliers = rng.normal(0, 1, (3000, 2))
    outliers = [(8.0, 8.0), (-9.0, 7.5), (10.0, -10.0)]
    rows = [
        (i, float(a), float(b))
        for i, (a, b) in enumerate(list(map(tuple, inliers)) + outliers)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    forest = ML.fit_isolation_forest(
        df, ["x", "y"], n_trees=50, sample_size=128
    )
    scored = ML.score_anomalies(df, forest)
    top10 = {
        r["id"]
        for r in scored.orderBy(F.desc("anomaly_score")).limit(10).collect()
    }
    assert {3000, 3001, 3002} <= top10
    mean_in = scored.filter("id < 3000").agg(
        F.avg("anomaly_score")
    ).first()[0]
    mean_out = scored.filter("id >= 3000").agg(
        F.avg("anomaly_score")
    ).first()[0]
    assert mean_out > mean_in + 0.15
    assert 0.3 < mean_in < 0.6


def test_jsonl_and_csv_ingest_with_corrupt_records(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest")
    jl = d / "docs.jsonl"
    jl.write_text(
        '{"doc_id": 1, "text": "ok one"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "ok two"}\n'
        '{"doc_id": "not-a-number", "text": 3}\n'
    )
    df = IO.read_jsonl(spark, str(jl), "doc_id long, text string")
    # caching required by Spark for corrupt-record queries that select
    # only the corrupt column; stats selects all -> fine
    stats = IO.corrupt_record_stats(df).first()
    assert stats["n_rows"] == 4 and stats["n_corrupt"] == 2
    good = df.filter(F.col(IO.CORRUPT_COL).isNull())
    assert {r["doc_id"] for r in good.collect()} == {1, 2}

    cv = d / "docs.csv"
    # structural malformation (wrong field count) flags _corrupt_record;
    # pure type-coercion failures null the field silently in Spark 4 CSV
    cv.write_text("doc_id,n\n1,10\n2,20,EXTRA,FIELDS\n3,30\n")
    cdf = IO.read_csv(spark, str(cv), "doc_id long, n int")
    cstats = IO.corrupt_record_stats(cdf).first()
    assert cstats["n_rows"] == 3 and cstats["n_corrupt"] == 1


def test_write_training_shards(spark, tmp_path_factory):
    """Shard export: file-count/row-cap honored, deterministic shard
    membership under num_shards, jsonl.gz round-trips."""
    import glob

    from data_quality_checker_spark.sources.io import (
        write_training_shards,
    )
    from data_quality_checker_spark.plans import synth

    d = str(tmp_path_factory.mktemp("shards"))
    pages = synth.pages_df(spark, 300, seed=41).select("url", "text")

    write_training_shards(
        pages, f"{d}/pq", max_records_per_file=50, num_shards=4
    )
    files = glob.glob(f"{d}/pq/part-*.parquet")
    back = spark.read.parquet(f"{d}/pq")
    assert back.count() == 300
    # 4 shards x >=2 files each (50-row cap over ~75 rows/shard)
    assert len(files) >= 4
    import pyarrow.parquet as pq

    assert max(pq.ParquetFile(f).metadata.num_rows for f in files) <= 50

    # deterministic membership: rewriting yields identical per-file sets
    write_training_shards(
        pages, f"{d}/pq2", max_records_per_file=10**9, num_shards=4
    )
    def shard_sets(p):
        out = []
        for f in sorted(glob.glob(f"{p}/part-*.parquet")):
            out.append(frozenset(
                r["url"] for r in spark.read.parquet(f).collect()
            ))
        return sorted(out, key=sorted)
    write_training_shards(
        pages, f"{d}/pq3", max_records_per_file=10**9, num_shards=4
    )
    assert shard_sets(f"{d}/pq2") == shard_sets(f"{d}/pq3")

    write_training_shards(pages, f"{d}/jl", fmt="jsonl")
    gz = glob.glob(f"{d}/jl/part-*.json.gz")
    assert gz
    jl = spark.read.json(f"{d}/jl")
    assert jl.count() == 300 and set(jl.columns) == {"url", "text"}


def test_shard_manifest(spark, tmp_path_factory):
    """Manifest: one row per shard file, exact row totals, real byte
    sizes, and an order-insensitive content digest that is invariant
    under row reordering but flips when any row changes."""
    import glob

    from pyspark.sql import functions as F

    from data_quality_checker_spark.plans import synth
    from data_quality_checker_spark.sources.io import (
        shard_manifest,
        write_training_shards,
    )

    d = str(tmp_path_factory.mktemp("manifest"))
    pages = synth.pages_df(spark, 200, seed=19).select("url", "text")
    write_training_shards(
        pages, f"{d}/a", max_records_per_file=10**9, num_shards=4
    )
    m = shard_manifest(spark, f"{d}/a").collect()
    files = {
        f.rsplit("/", 1)[-1]
        for f in glob.glob(f"{d}/a/part-*.parquet")
    }
    assert {r["shard"] for r in m} == files
    assert sum(r["n_rows"] for r in m) == 200
    assert all(r["n_bytes"] and r["n_bytes"] > 0 for r in m)

    # same rows, different intra-file order -> identical total digest
    write_training_shards(
        pages.orderBy(F.reverse("url")),
        f"{d}/b",
        max_records_per_file=10**9,
        num_shards=4,
    )
    def total_digest(p):
        return sum(
            r["content_digest"]
            for r in shard_manifest(spark, p).collect()
        )
    assert total_digest(f"{d}/a") == total_digest(f"{d}/b")

    # one changed row -> digest flips
    write_training_shards(
        pages.withColumn(
            "text",
            F.when(F.col("url").endswith("/p7"), F.lit("tampered"))
            .otherwise(F.col("text")),
        ),
        f"{d}/c",
        max_records_per_file=10**9,
        num_shards=4,
    )
    assert total_digest(f"{d}/c") != total_digest(f"{d}/a")

    # digest column selection narrows the contract
    narrow = shard_manifest(
        spark, f"{d}/a", content_digest_col=F.struct("url")
    ).collect()
    assert sum(r["n_rows"] for r in narrow) == 200

    # unknown fmt raises (parity with write_training_shards), never
    # silently falls through to the jsonl reader
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fmt"):
        shard_manifest(spark, f"{d}/a", fmt="json")

    # a value migrating between columns (the other NULL) must flip the
    # digest: raw multi-arg xxhash64 skips NULLs and would not
    ab = spark.createDataFrame(
        [("a", None)], "url string, text string"
    )
    ba = spark.createDataFrame(
        [(None, "a")], "url string, text string"
    )
    ab.write.mode("overwrite").parquet(f"{d}/mig_ab")
    ba.write.mode("overwrite").parquet(f"{d}/mig_ba")
    assert total_digest(f"{d}/mig_ab") != total_digest(f"{d}/mig_ba")


def test_shard_manifest_partitioned(spark, tmp_path_factory):
    """Partitioned exports: the recursive listing covers leaf files in
    key=value subdirectories, shard names are root-relative (unique
    across partition dirs), and every row gets real byte sizes."""
    from data_quality_checker_spark.plans import synth
    from data_quality_checker_spark.sources.io import shard_manifest

    d = str(tmp_path_factory.mktemp("manifest_part"))
    pages = (
        synth.pages_df(spark, 120, seed=23)
        .select("url", "text")
        .withColumn("bucket", F.abs(F.xxhash64("url")) % 3)
    )
    pages.repartition("bucket").write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(f"{d}/p")
    m = shard_manifest(spark, f"{d}/p").collect()
    assert sum(r["n_rows"] for r in m) == 120
    shards = [r["shard"] for r in m]
    assert len(shards) == len(set(shards))
    assert all(s.startswith("bucket=") and "/" in s for s in shards)
    assert all(r["n_bytes"] and r["n_bytes"] > 0 for r in m)


def test_compact_parquet(spark, tmp_path_factory):
    from data_quality_checker_spark.sources.io import (
        compact_parquet,
        list_data_files,
    )

    d = tmp_path_factory.mktemp("compact")
    src, dst = str(d / "src"), str(d / "dst")
    df = spark.range(20_000).selectExpr(
        "id", "id % 4 as pid", "repeat(uuid(), 4) as payload"
    )
    df.repartition(40).write.partitionBy("pid").parquet(src)
    n_before = len(list_data_files(spark, src))
    assert n_before >= 40  # the small-files mess
    stats = compact_parquet(
        spark, src, dst, target_mb=256, partition_col="pid"
    )
    assert stats["files_before"] == n_before
    # one file per partition value (4 values, tiny corpus)
    assert stats["files_after"] <= 8
    got = spark.read.parquet(dst)
    assert got.count() == 20_000
    assert {
        r["pid"] for r in got.select("pid").distinct().collect()
    } == {0, 1, 2, 3}
    assert set(got.columns) == {"id", "pid", "payload"}
    # unpartitioned form: row parity + close to target_files
    stats2 = compact_parquet(spark, src, str(d / "flat"), target_mb=256)
    assert stats2["files_after"] == stats2["target_files"] == 1
    assert spark.read.parquet(str(d / "flat")).count() == 20_000
    import pytest

    with pytest.raises(ValueError):
        compact_parquet(spark, src, str(d / "x"), target_mb=0)
