"""Iceberg writeTo path (sources/io.py write_table / iceberg_writer):
plan-level verification that runs in this jarless sandbox, plus a
jar-gated round-trip that activates the moment an
iceberg-spark-runtime jar lands on the classpath (VERDICT r04 item 5).

The north rule names Iceberg `bucket(N, url)` partitioning; the gated
branch was previously only prose. Building the DataFrameWriterV2 and
the bucket transform is catalog-free, so the spec is assertable here;
only createOrReplace touches the catalog and stays gated.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.sources import io as IO


def _df(spark):
    return spark.createDataFrame(
        [(f"https://h{i % 4}.example/p{i}", i) for i in range(20)],
        "url string, n long",
    )


def _has_iceberg(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_bucket_transform_is_the_north_rule_spec(spark):
    """The partition transform write_table ships to Iceberg is exactly
    bucket(N, url) — asserted on the unresolved expression, no catalog
    needed."""
    col = IO.bucket_transform(16, "url")
    assert str(col) == "Column<'bucket(16, url)'>"
    # and the writer builds without touching the (absent) catalog
    w = IO.iceberg_writer(_df(spark), "pages", "url", 16)
    from pyspark.sql.readwriter import DataFrameWriterV2

    assert isinstance(w, DataFrameWriterV2)


def test_parquet_fallback_same_bucketing_discipline(spark, tmp_path):
    """Without the Iceberg runtime, write_table with num_buckets
    expresses the same task-to-data mapping as an explicit
    partition_id=pmod(xxhash64(url), N) layout."""
    d = str(tmp_path / "pages")
    df = _df(spark)
    IO.write_table(df, "pages", path=d, num_buckets=4)
    back = spark.read.parquet(d)
    assert back.count() == 20
    assert "partition_id" in back.columns
    got = {
        r["url"]: r["partition_id"]
        for r in back.select("url", "partition_id").collect()
    }
    want = {
        r["url"]: r["pid"]
        for r in df.select(
            "url", IO.bucket_id("url", 4).alias("pid")
        ).collect()
    }
    assert got == want


def test_write_table_bucketed_fallback_full_replace(spark, tmp_path):
    """write_table REPLACES the whole table in the bucketed parquet
    fallback too (matching Iceberg's createOrReplace): a rewrite whose
    data happens to miss some buckets must not leave the first write's
    rows for those buckets behind (dynamic partition overwrite would —
    that's write_partitioned's resume contract, not a table sink's)."""
    d = str(tmp_path / "pages_replace")
    df = _df(spark)
    IO.write_table(df, "pages", path=d, num_buckets=4)
    assert spark.read.parquet(d).count() == 20
    # second write: one row -> occupies a single bucket
    one = df.limit(1)
    IO.write_table(one, "pages", path=d, num_buckets=4)
    back = spark.read.parquet(d)
    assert back.count() == 1  # no stale rows from missed buckets
    assert back.select("partition_id").distinct().count() == 1
    # static overwrite cleared the whole path: ONLY the surviving
    # bucket's directory remains on disk (no stale partition dirs)
    parts = {
        p.name
        for p in (tmp_path / "pages_replace").iterdir()
        if p.is_dir() and p.name.startswith("partition_id=")
    }
    assert len(parts) == 1


def test_iceberg_round_trip_when_jars_present(spark, tmp_path):
    """Jar-gated: executes the real writeTo + catalog read-back. Skips
    cleanly in this sandbox; activates unchanged when
    iceberg-spark-runtime is on the classpath AND the session was
    built with SPARK_DQC_ICEBERG=1 (the catalog conf must exist at
    session build time)."""
    from data_quality_checker_spark.session import ICEBERG_ENABLED

    if not _has_iceberg(spark):
        pytest.skip("no iceberg-spark-runtime jar on the classpath")
    if not ICEBERG_ENABLED:
        pytest.skip("session built without SPARK_DQC_ICEBERG=1")
    df = _df(spark)
    IO.write_table(df, "pages_rt", num_buckets=4)
    back = IO.read_table_by_name(spark, "pages_rt")
    assert back.count() == 20
    # the table's partition spec carries the bucket transform
    ddl = spark.sql("SHOW CREATE TABLE dqc.pages_rt").collect()[0][0]
    assert "bucket(4, url)" in ddl
