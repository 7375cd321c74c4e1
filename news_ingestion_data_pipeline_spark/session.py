"""SparkSession factory.

Local-mode defaults mirror what we'd set on a real cluster where it matters
(AQE on, sane shuffle partitioning, UTC session time zone, Arrow transfers);
cluster-only knobs (executor sizing, dynamic allocation) are left to
spark-submit conf so the same code runs on local[32] and on 1000 executors.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def stream_state_partitions(spark: SparkSession, n: int | str | None = None):
    """Pin ``spark.sql.shuffle.partitions`` for the duration of a
    streaming query (start → awaitTermination) and restore it after.

    A stateful streaming query fixes its state-store partition count from
    the session's shuffle partitions at the FIRST micro-batch. Profiled on
    stream_watermark_late_drop at sf0.1: with the session width (32),
    every micro-batch ran 32 state tasks burning 10-13 CPU-s on ~50 KB of
    state — per-partition state-store open/commit fixed cost, not data.
    State partitions should be sized to STATE VOLUME, not core count; the
    local default (SPARK_GRAFT_STREAM_STATE_PARTITIONS, 8) suits the
    fixture-scale states here, and a production job with large keyed
    state raises the env var — the partition count is pinned into the
    checkpoint, so pick it for the state you expect, not the cluster you
    happen to start on. Results are partitioning-independent (hash
    aggregation semantics are unchanged); only applied to memory-sink
    queries where no file-count artifact can leak into results."""
    n = str(
        n
        if n is not None
        else os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


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
        # Streaming state-store hygiene (profiled on the stream_* family,
        # r11). Spark 4.1 turns checkpoint-file checksums ON by default;
        # every state-store commit's delta-file close then parks in
        # ChecksumCheckpointFileManager.awaitResult waiting for the paired
        # checksum write (thread-dump evidence: 32 commit tasks blocked
        # ~10s each with ~50ms of CPU). Our streaming queries run against
        # EPHEMERAL per-query temp checkpoints — corruption detection on a
        # file that lives for one query buys nothing, so it's off by
        # default here; a production deployment with durable checkpoints
        # can re-enable via SPARK_GRAFT_STREAM_CKPT_CHECKSUM=true.
        .config(
            "spark.sql.streaming.checkpoint.fileChecksum.enabled",
            os.environ.get("SPARK_GRAFT_STREAM_CKPT_CHECKSUM", "false"),
        )
        # The state-store maintenance loop (default every 60s) iterates
        # EVERY provider ever loaded in the session; a long bench/verify
        # session accumulates hundreds of providers whose temp checkpoints
        # are already deleted, and the loop's churn degraded repeat runs of
        # one streaming query from 4.8s to 15-33s (measured). With tiny
        # per-query state, snapshot compaction buys nothing locally; a
        # long-running production job with durable state should keep a
        # short interval via SPARK_GRAFT_STREAM_MAINT_INTERVAL.
        .config(
            "spark.sql.streaming.stateStore.maintenanceInterval",
            os.environ.get("SPARK_GRAFT_STREAM_MAINT_INTERVAL", "3600s"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
