"""Storage-layout wave: the physical-design techniques that remove
shuffles and IO at 100 TB — bucketed co-located joins and partitioned
writes with partition-pruned reads — demonstrated as registered,
oracle-checked queries (each call rewrites its small layout under /tmp,
so the queries stay self-contained and idempotent).

Reference parity note: the reference's only storage decision is a single
SQLite file (database_utils/database_methods.py); these queries cover
the physical-design axis a Spark engine must add.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import dsum, register, t

_ROOT = "/tmp/spark_graft_storage"


def _sfx(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    description="Bucketed co-located join: orders and lineitem are "
    "written as tables bucketed (and sorted) on the join key with the "
    "same bucket count, so the join runs bucket-to-bucket with ZERO "
    "Exchange on either side — the technique that turns the biggest "
    "recurring shuffle of a 100 TB warehouse (fact-to-fact join on a "
    "shared key) into a scan-local merge. The aggregation keys on the "
    "join output, so only the tiny 5-row result shuffles. A test "
    "asserts the exchange count on both join inputs is zero.",
    tags=("join", "storage", "bucketing"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = _sfx(sf_dir)
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"bkt_{tbl}_{sfx}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            t(spark, sf_dir, tbl)
            .write.mode("overwrite")
            .option("path", f"{_ROOT}/{name}")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    o = spark.table(f"bkt_orders_{sfx}")
    li = spark.table(f"bkt_lineitem_{sfx}")
    # merge hint: at fact-to-fact scale SMJ is what the planner picks
    # anyway, but at test SF the small side fits the broadcast threshold
    # and a broadcast join would silently ignore the bucket layout this
    # query exists to demonstrate — pin the strategy the test asserts on.
    return (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scan_partition_pruned",
    oracle="""
SELECT CAST(ts AS DATE) AS day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
WHERE event_type = 'purchase'
GROUP BY CAST(ts AS DATE)
ORDER BY day
""",
    description="Partitioned layout + partition-pruned scan: events are "
    "written partitionBy(event_type) (Hive-style key=value directories), "
    "then read back with an event_type predicate. The filter resolves at "
    "PLANNING time against the directory listing — PartitionFilters in "
    "the scan node, non-matching partitions never opened — which at "
    "100 TB is the difference between reading one partition and reading "
    "the corpus. A test asserts the scan carries the PartitionFilters "
    "and reads only the matching directory.",
    tags=("scan", "storage", "pruning"),
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{_ROOT}/events_by_type_{_sfx(sf_dir)}"
    (
        t(spark, sf_dir, "events")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(path)
    )
    ev = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day")
    )
