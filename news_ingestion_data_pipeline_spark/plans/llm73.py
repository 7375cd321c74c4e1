"""Seventy-third wave: HDR latency percentiles and referential integrity.

agg_hdr_latency_percentiles is the observability-style histogram:
inter-arrival latencies land in log2 buckets (HdrHistogram's trick), the
percentile is read from bucket boundaries, and the EXACT order-statistic
percentile rides alongside so the bucketing error is measured, not
assumed.  pipeline_referential_integrity is the dull-but-critical DQ
audit every warehouse runs: orphaned facts and childless dimensions,
counted with samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_HDR_PCTS = [0.5, 0.9, 0.99]


@register(
    "agg_hdr_latency_percentiles",
    oracle=f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), g AS (
  SELECT gap_us FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0
), bucketed AS (
  SELECT gap_us,
         CAST(floor(log2(CAST(gap_us AS DOUBLE))) AS BIGINT) AS bkt
  FROM g
), hist AS (
  SELECT bkt, COUNT(*) AS c,
         SUM(COUNT(*)) OVER (ORDER BY bkt
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(COUNT(*)) OVER () AS n
  FROM bucketed GROUP BY bkt
), ranked AS (
  SELECT gap_us, ROW_NUMBER() OVER (ORDER BY gap_us) AS rn,
         COUNT(*) OVER () AS n
  FROM g
), pgrid AS (SELECT UNNEST([{", ".join(f"CAST({p!r} AS DOUBLE)" for p in _HDR_PCTS)}]) AS p)
SELECT pg.p,
       CAST((SELECT MIN(CASE WHEN h.cum >= CAST(ceil(pg.p * h.n) AS BIGINT)
                             THEN h.bkt END) FROM hist h) AS BIGINT)
         AS hdr_bucket_log2,
       round(pow(2.0, (SELECT MIN(CASE WHEN h.cum >= CAST(ceil(pg.p * h.n)
                                                     AS BIGINT)
                                       THEN h.bkt END) FROM hist h))
             / 1000000.0, 6) AS hdr_lower_bound_sec,
       round(CAST((SELECT MIN(CASE WHEN r.rn = CAST(ceil(pg.p * r.n) AS BIGINT)
                                   THEN r.gap_us END) FROM ranked r) AS DOUBLE)
             / 1000000.0, 6) AS exact_sec,
       round(CAST((SELECT MIN(CASE WHEN r.rn = CAST(ceil(pg.p * r.n) AS BIGINT)
                                   THEN r.gap_us END) FROM ranked r) AS DOUBLE)
             / pow(2.0, (SELECT MIN(CASE WHEN h.cum >= CAST(ceil(pg.p * h.n)
                                                      AS BIGINT)
                                         THEN h.bkt END) FROM hist h)), 6)
         AS exact_over_bucket
FROM pgrid pg
ORDER BY pg.p
""",
    description="HDR-histogram latency percentiles over per-user inter-"
    "arrival gaps: each gap lands in its floor(log2) bucket — the "
    "HdrHistogram/observability trick whose error is bounded "
    "MULTIPLICATIVELY (a 2x-wide bucket can misreport a percentile by "
    "at most 2x, at any magnitude) — and p50/p90/p99 are read from the "
    "cumulative bucket counts, with the EXACT order-statistic "
    "percentile alongside and the exact/bucket-bound ratio making the "
    "bucketing error observable (always in [1, 2)). This is the "
    "mergeable-histogram shape latency pipelines ship: buckets sum "
    "across hosts/days with no re-sort, while the exact rank (kept "
    "here as the audit baseline) does not. Shape: one lag window, one "
    "~64-bucket aggregate; the exact side's rank runs over the gap "
    "domain and is the part you drop at 100 TB.",
    tags=("agg", "stats", "monitoring", "sketch"),
)
def agg_hdr_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", us.alias("us"))
        .withColumn("gap_us", F.col("us") - F.lag("us").over(w))
        .filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
        .select("gap_us")
        .localCheckpoint()
    )
    bucketed = gaps.select(
        "gap_us",
        F.floor(F.log2(F.col("gap_us").cast("double"))).cast("bigint").alias("bkt"),
    )
    hist = (
        bucketed.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "bkt",
            F.sum("c")
            .over(
                Window.orderBy("bkt").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("cum"),
            F.sum("c")
            .over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("n"),
        )
    )
    ranked = gaps.select(
        "gap_us",
        F.row_number().over(Window.orderBy("gap_us")).alias("rn"),
        F.count(F.lit(1))
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"),
    )
    pgrid = gaps.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _HDR_PCTS])).alias("p")
    )
    hdr = (
        pgrid.crossJoin(hist)
        .groupBy("p")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.col("p") * F.col("n")).cast("bigint"),
                    F.col("bkt"),
                )
            ).alias("hdr_bucket_log2")
        )
    )
    exact = (
        pgrid.crossJoin(ranked)
        .groupBy("p")
        .agg(
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.col("p") * F.col("n")).cast("bigint"),
                    F.col("gap_us"),
                )
            ).alias("exact_us")
        )
    )
    return (
        hdr.join(exact, "p")
        .select(
            "p",
            F.col("hdr_bucket_log2").cast("bigint").alias("hdr_bucket_log2"),
            F.round(
                F.pow(F.lit(2.0), F.col("hdr_bucket_log2")) / 1_000_000.0, 6
            ).alias("hdr_lower_bound_sec"),
            F.round(F.col("exact_us").cast("double") / 1_000_000.0, 6).alias(
                "exact_sec"
            ),
            F.round(
                F.col("exact_us").cast("double")
                / F.pow(F.lit(2.0), F.col("hdr_bucket_log2")),
                6,
            ).alias("exact_over_bucket"),
        )
        
    )


@register(
    "pipeline_referential_integrity",
    oracle="""
WITH checks AS (
  SELECT 'lineitem_without_order' AS check_name,
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)) AS n_bad,
         (SELECT COUNT(*) FROM lineitem) AS n_total
  UNION ALL
  SELECT 'order_without_customer',
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)),
         (SELECT COUNT(*) FROM orders)
  UNION ALL
  SELECT 'customer_without_nation',
         (SELECT COUNT(*) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = c.c_nationkey)),
         (SELECT COUNT(*) FROM customer)
  UNION ALL
  SELECT 'customer_without_orders',
         (SELECT COUNT(*) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey)),
         (SELECT COUNT(*) FROM customer)
)
SELECT check_name,
       CAST(n_bad AS BIGINT) AS n_violations,
       CAST(n_total AS BIGINT) AS n_total,
       round(CAST(n_bad AS DOUBLE) / n_total, 6) AS violation_rate,
       CAST(n_bad = 0 AS BOOLEAN) AS passed
FROM checks
ORDER BY check_name
""",
    description="Referential-integrity audit across the star schema: "
    "orphaned facts (lineitems without their order, orders without "
    "their customer, customers without their nation) and the business-"
    "level inverse (customers with no orders — not a violation of the "
    "schema, but the number CRM teams ask for), each as a count, rate "
    "and pass flag — the dull-but-critical DQ gate that runs after "
    "every load and before every publish (pipeline_dq_expectations "
    "covers column-level rules; this covers CROSS-TABLE keys). Each "
    "check is one anti-join (left_anti in Spark, NOT EXISTS in the "
    "oracle) — at 100 TB the dimension side broadcasts and the fact "
    "scan streams through it; no check costs more than its scan.",
    tags=("pipeline", "dq", "join"),
)
def pipeline_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")

    def check(name, bad_df, total_df):
        bad = bad_df.agg(F.count(F.lit(1)).alias("n_bad"))
        tot = total_df.agg(F.count(F.lit(1)).alias("n_total"))
        return bad.crossJoin(tot).select(
            F.lit(name).alias("check_name"), "n_bad", "n_total"
        )

    checks = [
        check(
            "lineitem_without_order",
            li.join(
                orders.select(F.col("o_orderkey").alias("k")),
                li["l_orderkey"] == F.col("k"),
                "left_anti",
            ),
            li,
        ),
        check(
            "order_without_customer",
            orders.join(
                cust.select(F.col("c_custkey").alias("k")),
                orders["o_custkey"] == F.col("k"),
                "left_anti",
            ),
            orders,
        ),
        check(
            "customer_without_nation",
            cust.join(
                nation.select(F.col("n_nationkey").alias("k")),
                cust["c_nationkey"] == F.col("k"),
                "left_anti",
            ),
            cust,
        ),
        check(
            "customer_without_orders",
            cust.join(
                orders.select(F.col("o_custkey").alias("k")),
                cust["c_custkey"] == F.col("k"),
                "left_anti",
            ),
            cust,
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check_name",
        F.col("n_bad").cast("bigint").alias("n_violations"),
        F.col("n_total").cast("bigint").alias("n_total"),
        F.round(F.col("n_bad").cast("double") / F.col("n_total"), 6).alias(
            "violation_rate"
        ),
        (F.col("n_bad") == 0).alias("passed"),
    )
