"""Hundred-thirty-first wave: hidden partition transforms and alert
debouncing.

  * storage_hidden_partition_transforms — Iceberg's hidden
    partitioning, done manually the way plain-parquet estates must:
    events land partitioned by TWO derived transforms, day(ts) and an
    md5 bucket16→4 of user_id; the point query filters on the RAW
    columns and the plan adds the derived partition predicates, so
    both transforms prune at the directory level.  Files-read is
    observed from _metadata.file_path and oracle-pinned — the oracle
    computes from the raw data exactly how many (day, bucket)
    partitions a correct pruner may touch.
  * events_alert_debounce — the ops-alerting rule "fire only after K
    consecutive breaches": runs of value > 60 found with the
    gaps-and-islands rewrite, an alert at every K-th consecutive
    breach within a run, reset on clear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm131")
_UID = 42
_NB = 4

_SQL_BUCKET = (
    "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT)"
    f" % {_NB}"
)


@register(
    "storage_hidden_partition_transforms",
    oracle=f"""
WITH ev AS (
  SELECT user_id,
         epoch_us(ts) // 86400000000 AS p_day,
         {_SQL_BUCKET} AS p_bucket,
         value
  FROM events
),
bounds AS (SELECT MIN(p_day) AS d0 FROM ev),
target AS (
  SELECT CAST('0x' || substr(md5(CAST({_UID} AS VARCHAR)), 1, 4) AS BIGINT)
           % {_NB} AS tb,
         d0 + 3 AS lo, d0 + 9 AS hi
  FROM bounds
),
hit AS (
  SELECT e.user_id, e.p_day, e.p_bucket, e.value
  FROM ev e, target
  WHERE e.p_day BETWEEN target.lo AND target.hi
    AND e.user_id = {_UID}
),
prunable AS (
  SELECT COUNT(DISTINCT (e.p_day, e.p_bucket)) AS n_files
  FROM ev e, target
  WHERE e.p_day BETWEEN target.lo AND target.hi
    AND e.p_bucket = target.tb
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
         AS sum_value,
       (SELECT CAST(n_files AS BIGINT) FROM prunable) AS n_files_read
FROM hit
""",
    description="Iceberg-style HIDDEN partition transforms on plain "
    "parquet: the table lands partitioned by day(ts) and md5-bucket4 of "
    "user_id (one file per live partition), and the user-level point "
    "query filters on RAW ts/user_id while the plan supplies the derived "
    "partition predicates — both transforms prune at directory level, "
    "which is exactly what Iceberg automates and plain Spark must spell "
    "out. n_files_read is OBSERVED from _metadata.file_path and the "
    "oracle recomputes from raw data how many (day, bucket) partitions "
    "a correct pruner may touch, so reading even one extra file "
    "hash-fails. At 100 TB this layout turns a needle query from a "
    "full scan into <= days x 1 file.",
    tags=("storage", "scan", "pipeline"),
)
def storage_hidden_partition_transforms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import hashlib
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_ROOT}/hp_{sfx}"
    shutil.rmtree(path, ignore_errors=True)

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "p_day"
        ),
        F.expr(
            "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 4), 16, 10)"
            f" AS BIGINT) % {_NB}"
        ).alias("p_bucket"),
    )
    # explicit partition count: a column-only repartition of a ~1 MB
    # frame is AQE-coalesced to ONE post-shuffle partition, and that
    # single task then writes every (day, bucket) directory sequentially
    # (profiled 9.5 s serial stage). Sizing by defaultParallelism keeps
    # one file per live partition (each combo still hashes to one task)
    # at any cluster width.
    (
        ev.repartition(
            ev.sparkSession.sparkContext.defaultParallelism,
            "p_day",
            "p_bucket",
        )
        .write.partitionBy("p_day", "p_bucket")
        .mode("overwrite")
        .parquet(path)
    )
    d0 = ev.agg(F.min("p_day")).collect()[0][0]  # scalar plan constant
    tb = int(hashlib.md5(str(_UID).encode()).hexdigest()[:4], 16) % _NB
    lo, hi = d0 + 3, d0 + 9

    # the derived partition predicates a hidden-partitioning layer would
    # inject — this is the scan both aggregates below share
    pruned = spark.read.parquet(path).filter(
        (F.col("p_day").between(lo, hi)) & (F.col("p_bucket") == tb)
    )
    # files the pruned scan touches (partition-level truth, before the
    # row-level user filter — a file can match the partitions yet hold
    # no rows for this user)
    files = pruned.agg(
        F.countDistinct(F.col("_metadata.file_path")).alias("n_files_read")
    )
    hit = pruned.filter(F.col("user_id") == _UID).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )
    return hit.crossJoin(F.broadcast(files))


_THRESH = 60.0
_K = 3


@register(
    "events_alert_debounce",
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN value > {_THRESH} THEN 1 ELSE 0 END AS breach,
         ROW_NUMBER() OVER w AS rn,
         SUM(CASE WHEN value > {_THRESH} THEN 1 ELSE 0 END) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS brn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, rn - brn
                            ORDER BY ts, event_id) AS run_pos
  FROM seq WHERE breach = 1
),
alerts AS (
  SELECT user_id, ts FROM runs WHERE run_pos % {_K} = 0
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_alerts,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_alert_ts
FROM alerts
GROUP BY user_id
ORDER BY user_id
""",
    description=f"Alert debouncing — fire only on every {_K}th CONSECUTIVE "
    f"breach (value > {_THRESH}), reset when a reading clears: breach "
    "runs isolated with the gaps-and-islands rewrite (rn - breach_rn is "
    "constant within a run), position-in-run taken per island, alerts at "
    "positions divisible by K. The stateless-window form of what naive "
    "implementations do with per-row state — one (user) shuffle shared "
    "by all three windows. Output: per-user alert count and first alert "
    "time (users with zero alerts correctly absent).",
    tags=("events", "window", "anomaly"),
)
def events_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    breach = F.when(F.col("value") > _THRESH, 1).otherwise(0)
    seq = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        breach.alias("breach"),
        F.row_number().over(w).alias("rn"),
        F.sum(breach).over(w).alias("brn"),
    )
    runs = (
        seq.filter(F.col("breach") == 1)
        .withColumn(
            "run_pos",
            F.row_number().over(
                Window.partitionBy(
                    "user_id", (F.col("rn") - F.col("brn"))
                ).orderBy("ts", "event_id")
            ),
        )
    )
    alerts = runs.filter(F.col("run_pos") % _K == 0)
    return (
        alerts.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_alerts"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_alert_ts"
            ),
        )
        
    )
