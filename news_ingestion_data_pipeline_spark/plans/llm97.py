"""Ninety-seventh wave: UPDATE-mode emission semantics and multi-horizon
feature backfill.

  * stream_update_mode_emissions — the companion proof to wave 94's
    append-mode drops: in UPDATE mode every micro-batch emits the
    updated (key, cumulative-aggregate) rows, and the memory sink
    accumulates them — so the drained table is the full per-batch
    emission HISTORY, not one final snapshot.  The oracle replays it:
    per (key, batch) activity -> cumulative aggregate through that
    batch, one output row per (key, active-batch).  This is the
    contract an update-mode sink (e.g. a keyed KV upsert) consumes at
    100 TB — what gets written per trigger, not just what's true at
    the end.
  * feature_rolling_horizons — the feature-store backfill matrix: per
    (user, day) daily activity plus trailing 7-day and 28-day counts
    and sums computed with integer day-index RANGE frames.  One hash
    aggregate to days, then per-user ordered frames — the horizons
    share the single per-user sort, which is the whole point of
    computing them together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm97")

#: map-side time-range quartile batch assignment (wave 94's rule,
#: without the late-arrival shift — update mode has no drops to stage)
_BATCH_SQL = """
  SELECT event_type, value,
         CAST(1 + ((epoch_us(ts) - mn) * 4) // (mx - mn + 1) AS BIGINT)
           AS batch
  FROM events,
       (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        FROM events)
"""


@register(
    "stream_update_mode_emissions",
    oracle=f"""
WITH b AS ({_BATCH_SQL}),
per_batch AS (
  SELECT event_type, batch,
         COUNT(*) AS dn,
         SUM(CAST(value AS DECIMAL(20,10))) AS dv
  FROM b GROUP BY event_type, batch
)
SELECT event_type,
       CAST(SUM(dn) OVER w AS BIGINT) AS n_events,
       CAST(CAST(SUM(dv) OVER w AS VARCHAR) AS DOUBLE) AS sum_value
FROM per_batch
WINDOW w AS (PARTITION BY event_type ORDER BY batch
             ROWS UNBOUNDED PRECEDING)
ORDER BY event_type, n_events
""",
    description="UPDATE-mode emission history, proven end to end (the "
    "companion to wave 94's append-mode drop proof): events stream as "
    "4 time-quartile files (map-side integer epoch-us assignment), "
    "grouped counts/sums drain in update mode, and the memory sink "
    "keeps every batch's emitted rows — so the result is one row per "
    "(key, batch-with-activity) carrying the CUMULATIVE aggregate at "
    "that batch, the exact sequence of upserts a keyed sink would "
    "receive. The oracle replays it with a per-(key,batch) aggregate "
    "+ running sum over batches — a Spark build that emitted "
    "non-updated keys, skipped an update, or emitted deltas instead "
    "of cumulative values hash-fails. Sums run through exact DECIMAL "
    "so every emission snapshot is bit-identical cross-engine.",
    tags=("streaming", "llm", "agg"),
)
def stream_update_mode_emissions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import hashlib
    import os
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src = f"{_ROOT}/upd4_{sfx}"
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)

    ev = t(spark, sf_dir, "events").select("event_type", "value", "ts")
    bounds = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mn"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mx"),
    )
    batched = (
        ev.crossJoin(F.broadcast(bounds))
        .withColumn(
            "batch",
            F.expr(
                "CAST(1 + ((unix_micros(CAST(ts AS TIMESTAMP)) - mn) * 4)"
                " DIV (mx - mn + 1) AS BIGINT)"
            ),
        )
        .select("event_type", "value", "batch")
        .localCheckpoint(eager=True)
    )
    base_t = 1_700_000_000
    for k in range(1, 5):
        tmp = f"{src}/_tmp{k}"
        batched.filter(F.col("batch") == k).drop("batch").coalesce(
            1
        ).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        tgt = f"{src}/{k:02d}.parquet"
        shutil.move(part, tgt)
        shutil.rmtree(tmp)
        os.utime(tgt, (base_t + k, base_t + k))

    name = f"stream_upd_{sfx}"
    for qq in spark.streams.active:
        if qq.name == name:
            qq.stop()
    res = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,10)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    from news_ingestion_data_pipeline_spark.session import (
        stream_state_partitions,
    )

    with stream_state_partitions(spark):
        stream = (
            res.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        stream.awaitTermination()
        stream.stop()
    return spark.table(name)


@register(
    "feature_rolling_horizons",
    oracle="""
WITH daily AS (
  SELECT user_id,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(epoch(CAST(date_trunc('day', ts) AS DATE)) // 86400 AS BIGINT)
           AS day_idx,
         COUNT(*) AS dn,
         SUM(CAST(value AS DECIMAL(20,10))) AS dv
  FROM events
  GROUP BY 1, 2, 3
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(dn AS BIGINT) AS n_1d,
       CAST(SUM(dn) OVER w7 AS BIGINT) AS n_7d,
       CAST(SUM(dn) OVER w28 AS BIGINT) AS n_28d,
       CAST(CAST(dv AS VARCHAR) AS DOUBLE) AS v_1d,
       CAST(CAST(SUM(dv) OVER w7 AS VARCHAR) AS DOUBLE) AS v_7d,
       CAST(CAST(SUM(dv) OVER w28 AS VARCHAR) AS DOUBLE) AS v_28d
FROM daily
WINDOW
  w7 AS (PARTITION BY user_id ORDER BY day_idx
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
  w28 AS (PARTITION BY user_id ORDER BY day_idx
          RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
ORDER BY user_id, day
""",
    description="Feature-store backfill matrix — per (user, day) daily "
    "activity plus trailing 7-day and 28-day counts and value sums, "
    "the multi-horizon feature set a ranking model trains on: one "
    "hash aggregate compresses events to (user, day) rows (the only "
    "corpus-sized pass), then integer day-index RANGE frames compute "
    "both horizons over the SAME per-user sort — adding a horizon "
    "costs one more frame, not another shuffle. Day gaps are handled "
    "by the RANGE (not ROWS) frame: a user's quiet days simply don't "
    "contribute. Sums carry exact DECIMAL through every frame. At "
    "100 TB this parallelizes by user and is the batch backfill twin "
    "of a streaming feature pipeline.",
    tags=("feature", "window", "events"),
)
def feature_rolling_horizons(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "ts", "value")
    daily = (
        e.groupBy(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("dn"),
            F.sum(F.col("value").cast("decimal(20,10)")).alias("dv"),
        )
        .withColumn(
            "day_idx",
            F.expr("CAST(unix_date(day) AS BIGINT)"),
        )
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rangeBetween(-6, 0)
    )
    w28 = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rangeBetween(-27, 0)
    )
    return daily.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("dn").cast("bigint").alias("n_1d"),
        F.sum("dn").over(w7).cast("bigint").alias("n_7d"),
        F.sum("dn").over(w28).cast("bigint").alias("n_28d"),
        F.col("dv").cast("double").alias("v_1d"),
        F.sum("dv").over(w7).cast("double").alias("v_7d"),
        F.sum("dv").over(w28).cast("double").alias("v_28d"),
    )
