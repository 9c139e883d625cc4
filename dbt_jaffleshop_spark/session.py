"""SparkSession factory.

Single place where execution-engine knobs live. The settings are chosen for
oracle parity (UTC session timezone; ANSI mode pinned ON — the Spark 4
default — so arithmetic errors fail loudly instead of silently nulling,
and every model null-guards divisions explicitly) and for scale (AQE on,
skew-join handling on, shuffle partition count sized to the environment
instead of the 200 default).

On a real cluster the same factory applies — only ``master`` and the
shuffle-partition count change (shuffle partitions ~ 2-3x total cores, and
AQE coalesces down at runtime anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)


def get_spark(app_name: str = "dbt_jaffleshop_spark") -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Notes on the choices:

    * ``spark.sql.session.timeZone=UTC`` — DuckDB (the correctness oracle)
      treats timestamps as UTC-naive; pinning the session TZ makes
      date_trunc/extract agree.
    * ``spark.sql.shuffle.partitions`` — sized to cores for local mode;
      at cluster scale AQE coalesces small post-shuffle partitions, so a
      too-large static value is safe, a too-small one is not.
    * AQE + skew-join — runtime re-planning: broadcast-switches joins whose
      build side turns out small, splits skewed shuffle partitions.
    * Arrow — vectorized createDataFrame/toPandas and Pandas-UDF transport.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT96 (the Spark default) is deprecated AND statless: parquet
        # footers carry no min/max for it, which disables both row-group
        # pruning and the manifest-stats file skipping in plans/layout.py.
        # TIMESTAMP_MICROS is what Delta/Iceberg write.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    if "SPARK_GRAFT_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_GRAFT_MASTER"])
    elif SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
