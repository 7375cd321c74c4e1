"""Ninety-fourth wave: append-mode watermark late-data DROP accounting.

The registry's streaming family proves windows, dedup, joins, state and
checkpoint-resume, but every windowed aggregate so far drains in
COMPLETE mode, where the watermark never changes the answer.  This wave
pins the one semantics production pipelines actually argue about: in
APPEND mode, which late rows does the watermark silently drop, and
which windows ever emit?

The exact rules, measured on this Spark build (local experiment with
hand-crafted batches, progress-log watermarks):

  * the watermark used to FILTER batch k's input is the eviction
    watermark of batch k-1 — i.e. max event time through batch k-2
    minus the delay (one full batch of lag: a late row is kept if its
    window was still open at the END of the PREVIOUS batch);
  * a kept late row lands in its still-open window even when THIS
    batch's closing watermark will evict that window minutes later —
    eviction happens after aggregation;
  * at end-of-input (AvailableNow) a final no-data batch advances the
    watermark to global-max-minus-delay and flushes eligible windows;
    windows whose end exceeds that final watermark NEVER emit.

The oracle replays those rules in SQL: per-batch max ts -> running-max
eviction watermark -> lagged filter watermark -> per-row drop rule ->
final-flush emission rule.  A Spark build with different watermark
semantics hash-fails; so would a simulation that guessed any of the
three rules wrong (each was wrong in the first draft of the local
experiment — this oracle encodes what Spark DOES, not the folklore).

Batches are time-quartiles of the events table with a deterministic 1/23
subset of each quartile arriving one batch late — so every batch carries
a mix of on-time rows, late-but-kept rows (window still open), and
late-dropped rows (window closed a batch ago).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_SQL_VAL_SUM = "CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)"
_ROOT = scratch_root("llm94")

#: batch assignment shared by both engines: quarter of the corpus time
#: RANGE (exact integer epoch-microsecond math — a pure map, no global
#: sort), with rows whose event_id % 23 == 0 arriving one batch late
#: (except quartile 4)
_BATCH_SQL = """
  SELECT event_id, ts, event_type, value,
         CASE WHEN event_id % 23 = 0 AND q < 4 THEN q + 1 ELSE q END AS batch
  FROM (SELECT event_id, ts, event_type, value,
               CAST(1 + ((epoch_us(ts) - mn) * 4) // (mx - mn + 1) AS BIGINT)
                 AS q
        FROM events,
             (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
              FROM events))
"""


@register(
    "stream_watermark_late_drop",
    oracle=f"""
WITH b AS ({_BATCH_SQL}),
bmax AS (
  SELECT batch, MAX(ts) AS mx FROM b GROUP BY batch
), wm AS (
  SELECT batch,
         MAX(mx) OVER (ORDER BY batch
                       ROWS UNBOUNDED PRECEDING) AS cm
  FROM bmax
), fwm AS (
  -- the watermark that FILTERS batch k was computed from data through
  -- batch k-2 (it performed the eviction at the end of batch k-1)
  SELECT batch,
         lag(cm, 2) OVER (ORDER BY batch) - INTERVAL 30 MINUTE AS filter_wm
  FROM wm
), kept AS (
  SELECT b.*,
         date_trunc('hour', b.ts) AS ws,
         date_trunc('hour', b.ts) + INTERVAL 1 HOUR AS wend
  FROM b JOIN fwm USING (batch)
  WHERE fwm.filter_wm IS NULL OR date_trunc('hour', b.ts) + INTERVAL 1 HOUR
        > fwm.filter_wm
), final AS (
  SELECT MAX(mx) - INTERVAL 30 MINUTE AS fw FROM bmax
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {_SQL_VAL_SUM} AS sum_value
FROM kept
WHERE wend <= (SELECT fw FROM final)
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    description="APPEND-mode watermark drop semantics, proven end to "
    "end: events re-laid as 4 time-quartile files with 1/23 of each "
    "quartile arriving one batch LATE, streamed one file per "
    "micro-batch through withWatermark('30 minutes') + 1h tumbling "
    "windows into an append-mode sink. The oracle replays Spark's "
    "MEASURED rules — batch k filters with batch k-1's eviction "
    "watermark (max event time through k-2 minus delay), kept late "
    "rows join still-open windows even when this batch's watermark "
    "closes them, the AvailableNow end-of-input flush emits exactly "
    "the windows whose end <= global-max-minus-delay — so the drained "
    "sink hash-matches only if every silently-dropped row and every "
    "never-emitted trailing window agrees. This is the correctness "
    "contract a 100 TB continuous pipeline relies on when it sizes "
    "its watermark delay against upstream lag.",
    tags=("streaming", "llm", "window"),
)
def stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import hashlib
    import os
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src = f"{_ROOT}/ev4_{sfx}"
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)

    ev = t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    # harness prep (not the measured operator): re-lay the corpus as
    # arrival files by time-RANGE quartile — exact integer epoch math,
    # a pure map over one broadcast (min, max) scalar, no global sort
    bounds = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mn"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mx"),
    )
    q = (
        ev.crossJoin(F.broadcast(bounds))
        .withColumn(
            "q",
            F.expr(
                "CAST(1 + ((unix_micros(CAST(ts AS TIMESTAMP)) - mn) * 4)"
                " DIV (mx - mn + 1)"
                " AS BIGINT)"
            ),
        )
        .drop("mn", "mx")
    )
    batched = q.withColumn(
        "batch",
        F.when((F.col("event_id") % 23 == 0) & (F.col("q") < 4), F.col("q") + 1)
        .otherwise(F.col("q")),
    ).drop("q")
    # ONE partitioned write lays out all four arrival files in a single
    # job (hash-repartition on batch -> exactly one part file per batch
    # directory), replacing the localCheckpoint + four filtered
    # coalesce(1) writes — five sequential jobs of harness prep become
    # one, and the corpus is scanned once instead of being pinned.
    base_t = 1_700_000_000
    tmp = f"{src}/_tmp"
    batched.repartition(4, F.col("batch")).write.partitionBy("batch").parquet(tmp)
    for k in range(1, 5):
        part = glob.glob(f"{tmp}/batch={k}/part-*.parquet")[0]
        tgt = f"{src}/{k:02d}.parquet"
        shutil.move(part, tgt)
        os.utime(tgt, (base_t + k, base_t + k))
    shutil.rmtree(tmp)

    name = f"stream_wm_drop_{sfx}"
    for qq in spark.streams.active:
        if qq.name == name:
            qq.stop()
    res = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    # state-volume-sized state-store width (profiled r12: the session
    # width gave 32 near-empty state tasks x ~11 CPU-s per micro-batch)
    from news_ingestion_data_pipeline_spark.session import (
        stream_state_partitions,
    )

    with stream_state_partitions(spark):
        stream = (
            res.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        stream.awaitTermination()
        stream.stop()
    return spark.table(name)
