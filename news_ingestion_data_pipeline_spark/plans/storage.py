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
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("storage")


def _sfx(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
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
        
    )


@register(
    "scan_jsonl_permissive",
    oracle="""
SELECT lang,
       COUNT(*) AS n_good,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang
UNION ALL
SELECT '_corrupt' AS lang, CAST(7 AS BIGINT) AS n_good,
       CAST(NULL AS BIGINT) AS sum_chars
ORDER BY lang
""",
    description="JSON-lines source with PERMISSIVE corrupt-record "
    "handling: documents are serialized to JSONL (to_json per row), 7 "
    "deterministically malformed lines are injected, and the read uses "
    "an explicit schema plus a _corrupt_record column — bad rows land "
    "in the quarantine column with every good field NULL instead of "
    "failing the scan, the tolerance mode a 100 TB ingest of "
    "third-party JSON requires (schema inference is also avoided: one "
    "pass, no sampling job). Output is per-lang counts over the good "
    "rows plus the corrupt-row count, so the oracle (raw table + the "
    "injected constant) certifies both the round-trip fidelity and the "
    "quarantine count.",
    tags=("scan", "storage", "json", "errors"),
)
def scan_jsonl_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    path = f"{_ROOT}/docs_jsonl_{_sfx(sf_dir)}"
    docs = t(spark, sf_dir, "documents")
    docs.select(F.to_json(F.struct(*docs.columns)).alias("value")).coalesce(
        4
    ).write.mode("overwrite").text(path)
    # inject malformed lines (deterministic count) as an extra file the
    # glob picks up, exactly like a bad producer shard would appear
    with open(os.path.join(path, "part-corrupt.txt"), "w", encoding="utf-8") as f:
        for i in range(7):
            f.write(f'{{"doc_id": {i}, "lang": "en", truncated...\n')
    schema = (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint, _corrupt_record string"
    )
    read = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # single-pass aggregate on a derived routing key (Spark forbids
    # predicates that reference ONLY the internal corrupt-record column
    # on an uncached parse — and one pass is the better plan anyway)
    routed = F.when(
        F.col("_corrupt_record").isNotNull(), F.lit("_corrupt")
    ).otherwise(F.col("lang"))
    return (
        read.groupBy(routed.alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_good"),
            F.sum("n_chars").alias("sum_chars"),
        )
        
    )


@register(
    "scan_csv_roundtrip",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="CSV source round-trip with explicit schema and quoting: "
    "orders are written as headered CSV (priorities contain spaces and "
    "hyphens — real quoting surface), read back with a declared schema "
    "(no inference pass, no type drift: the timestamp column round-trips "
    "through an explicit timestampFormat), and aggregated. A hash-match "
    "against the parquet-sourced oracle certifies the whole "
    "serialize→parse cycle is lossless — the check that matters when a "
    "100 TB pipeline must ingest legacy CSV feeds next to parquet.",
    tags=("scan", "storage", "csv"),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{_ROOT}/orders_csv_{_sfx(sf_dir)}"
    orders = t(spark, sf_dir, "orders")
    (
        orders.coalesce(4)
        .write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
    schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
    read = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
    return (
        read.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        
    )
