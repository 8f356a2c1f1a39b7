"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE, skew-join handling,
Arrow for the pandas-UDF path) while staying correct on local[N]:
 - UTC session timezone so timestamp semantics are stable across engines
   (the DuckDB oracle reads the same parquet as naive-UTC).
 - AQE on: runtime coalescing + skew-join splitting replaces hand-tuned
   shuffle partition counts at real scale.
 - Arrow on: every JVM<->Python crossing is columnar-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Iceberg is the production table format (bucket(N, url) partition
# transform per the north rule). The sandbox has no Iceberg jars, so the
# runtime gates it: set SPARK_DQC_ICEBERG=1 in an environment where
# `iceberg-spark-runtime` is on the classpath to enable the catalog conf.
ICEBERG_ENABLED = os.environ.get("SPARK_DQC_ICEBERG", "0") == "1"


def get_spark(
    app_name: str = "data-quality-checker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Args:
        master: e.g. "local[8]"; None defers to spark-submit / env.
        shuffle_partitions: initial shuffle parallelism; AQE coalesces
            down at runtime so err on the high side for big inputs.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # local-mode memory: generous but bounded; executors on a real
        # cluster size this via spark-submit.
        "spark.driver.memory": os.environ.get("SPARK_DQC_DRIVER_MEM", "8g"),
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions
            if shuffle_partitions is not None
            else int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        ),
        # 128 MiB scan splits: good parquet split size at 100 TB too.
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.ui.enabled": "false",
    }
    if ICEBERG_ENABLED:
        conf.update(
            {
                "spark.sql.extensions": (
                    "org.apache.iceberg.spark.extensions"
                    ".IcebergSparkSessionExtensions"
                ),
                "spark.sql.catalog.dqc": "org.apache.iceberg.spark.SparkCatalog",
                "spark.sql.catalog.dqc.type": "hadoop",
                "spark.sql.catalog.dqc.warehouse": os.environ.get(
                    "SPARK_DQC_WAREHOUSE", "/tmp/dqc_warehouse"
                ),
            }
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
