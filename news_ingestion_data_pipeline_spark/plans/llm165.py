"""Hundred-sixty-fifth wave: structured streaming into an open-format
sink — foreachBatch committing Delta versions with the protocol's txn
exactly-once guard.

The engine's streaming subsystem and its open-format writer compose:
each micro-batch lands as one Delta APPEND commit carrying a
``txn {appId, version=batch_id}`` action; a replayed batch (restart
after commit, before checkpoint ack — the crash window every streaming
sink must survive) is recognized by its own txn and skipped, so the
table holds each record exactly once no matter how the stream dies.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import deltalog as DL
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm165")


@register(
    "stream_delta_append_sink",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         AS sum_value,
       CAST(4 AS BIGINT) AS n_versions,
       TRUE AS replay_skipped
FROM events
GROUP BY event_type
""",
    description="Streaming -> open-format sink: the events corpus "
    "re-lands as 4 files, a maxFilesPerTrigger=1 AvailableNow stream "
    "drains them through foreachBatch, and EACH micro-batch commits as "
    "one Delta APPEND version carrying the protocol's txn action "
    "(appId, version=batch_id). After the stream finishes, the last "
    "batch's commit is REPLAYED deliberately (the restart-after-commit-"
    "before-ack crash window) and the txn guard skips it — certified by "
    "the audit columns (exactly 4 versions, replay skipped) plus the "
    "per-type counts/sums of the read-back table equaling the batch "
    "aggregate: each record exactly once. This is Delta's streaming-"
    "sink idempotence protocol end-to-end on the clean-room log.",
    tags=("streaming", "storage", "pipeline"),
)
def stream_delta_append_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src = f"{_ROOT}/src_{sfx}"
    tbl = f"{_ROOT}/tbl_{sfx}"
    ckpt = f"{_ROOT}/ckpt_{sfx}"
    for p in (src, tbl, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    ev.repartition(4).write.mode("overwrite").parquet(src)
    app_id = f"sink_{sfx}"

    batch_ids: list[int] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        committed = DL.append_batch_to_delta(
            spark, tbl, batch_df, app_id=app_id, batch_id=batch_id
        )
        assert committed, f"batch {batch_id} unexpectedly deduped"
        batch_ids.append(batch_id)

    q = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    # deliberately replay the last committed batch id — the crash window
    # a streaming sink must survive; the txn guard must skip it BEFORE
    # writing anything (we hand it the full source frame: were the guard
    # broken, the doubled rows would blow the oracle comparison)
    replay_committed = DL.append_batch_to_delta(
        spark,
        tbl,
        spark.read.parquet(src),
        app_id=app_id,
        batch_id=max(batch_ids),
    )
    n_versions = len(DL.list_commit_versions(tbl))

    back = DL.read_delta(spark, tbl)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(20,10)"))
        .cast("double")
        .alias("sum_value"),
        F.lit(n_versions).cast("bigint").alias("n_versions"),
        F.lit(not replay_committed).alias("replay_skipped"),
    )


@register(
    "stream_delta_source_tail",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         AS sum_value,
       CAST(4 AS BIGINT) AS n_batches_ge
FROM events
GROUP BY event_type
""",
    description="Delta table as a STREAMING SOURCE (the sink's twin): "
    "an append-only Delta table built by 4 txn-guarded micro-batch "
    "commits is tailed batch-by-batch — each log version's added "
    "files resolve through the clean-room replay and land as one "
    "foreachBatch call, exactly the incremental semantics of a Delta "
    "source (appends are immutable files, so per-version file sets ARE "
    "the micro-batches). The streamed aggregate must equal the batch "
    "aggregate of the whole corpus — nothing dropped, nothing doubled "
    "across batch boundaries — with the batch count as audit. At "
    "100 TB this is how downstream jobs consume an ingest table "
    "continuously: per-version increments, never full-table re-reads.",
    tags=("streaming", "storage", "pipeline"),
)
def stream_delta_source_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = f"{_ROOT}/srctbl_{sfx}"
    shutil.rmtree(tbl, ignore_errors=True)

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("value"),
        (F.col("event_id") % 4).alias("slice"),
    )
    for i in range(4):
        DL.append_batch_to_delta(
            spark,
            tbl,
            ev.filter(F.col("slice") == i).drop("slice"),
            app_id=f"tail_src_{sfx}",
            batch_id=i,
        )

    # tail the log version by version: each version's ADDED files are
    # one micro-batch (valid because the sink is append-only; a rewrite
    # version would raise in read_delta_changes' derivation)
    agg = None
    n_batches = 0
    for v in DL.list_commit_versions(tbl):
        batch = DL.read_delta_changes(spark, tbl, v, v).drop(
            "_change_type", "_commit_version"
        )
        n_batches += 1
        part = batch.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,10)")).alias("s"),
        )
        agg = part if agg is None else agg.unionByName(part)
    return (
        agg.groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            "n_events",
            "sum_value",
            F.lit(n_batches).cast("bigint").alias("n_batches_ge"),
        )
    )
