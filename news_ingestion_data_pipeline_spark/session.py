"""SparkSession factory.

Local-mode defaults mirror what we'd set on a real cluster where it matters
(AQE on, sane shuffle partitioning, UTC session time zone, Arrow transfers);
cluster-only knobs (executor sizing, dynamic allocation) are left to
spark-submit conf so the same code runs on local[32] and on 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "news_ingestion_data_pipeline_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    At 100 TB the important settings are the ones below that shape plans, not
    local sizing: AQE (runtime coalesce + skew-join splitting), advisory
    partition sizes, and broadcast threshold. ``spark.sql.shuffle.partitions``
    is a starting point only — AQE coalesces it down per-stage.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = str(
        shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 24g, not the machine's full 128g: this single local JVM is
        # driver+executors, and a huge G1 heap filling with humongous array
        # allocations (shingle/embedding arrays) hits multi-tens-of-seconds
        # full-GC pauses — measured a 5s query spiking to 70s at 48g, stable
        # at 16-24g. Right-sizing the heap IS the fix, not GC flags.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
