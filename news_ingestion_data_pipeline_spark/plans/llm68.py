"""Sixty-eighth wave: tolerance-bounded as-of join and the repeat-purchase
curve.

join_asof_tolerance is join_asof with the staleness bound pandas'
merge_asof calls `tolerance`: a prior match older than the bound is NOT a
match — the semantics every feature-freshness contract actually wants
(a price quote from last week must not enrich today's trade).
orders_repeat_purchase_curve is the k-th-order retention distribution —
what fraction of customers ever place ≥ k orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t, ts_str

_TOL_MIN = 120  # as-of tolerance, minutes


@register(
    "join_asof_tolerance",
    oracle=f"""
SELECT event_id, user_id, purchase_ts,
       CASE WHEN fresh THEN last_view_ts END AS last_view_ts,
       CASE WHEN fresh THEN last_view_value END AS last_view_value,
       CAST(matched AND NOT fresh AS BOOLEAN) AS dropped_stale
FROM (
  SELECT p.event_id, p.user_id,
         strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts,
         CAST(v.value AS DOUBLE) AS last_view_value,
         v.ts IS NOT NULL AS matched,
         v.ts IS NOT NULL
           AND epoch_us(p.ts) - epoch_us(v.ts) <= CAST({_TOL_MIN} AS BIGINT) * 60000000
           AS fresh
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
    ON p.user_id = v.user_id AND p.ts >= v.ts
)
ORDER BY event_id
""",
    description=f"As-of join with a {_TOL_MIN}-minute staleness tolerance "
    "(pandas merge_asof's `tolerance`): each purchase takes its user's "
    "most recent prior view ONLY if that view is fresh enough, "
    "otherwise the enrichment is nulled and flagged dropped_stale — "
    "the freshness contract real feature lookups carry (a quote from "
    "last week must not enrich today's trade; join_asof without the "
    "bound silently would). Same single-shuffle construction as "
    "join_asof (union + last(ignoreNulls) window with the tie-break "
    "matching DuckDB ASOF semantics); the tolerance is a map-side "
    "integer-microsecond predicate applied AFTER the match so the "
    "'matched but stale' population is observable, not silently "
    "conflated with 'never matched'.",
    tags=("join", "window", "timeseries"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("is_left"),
        F.lit(None).cast(ev.schema["ts"].dataType).alias("r_ts"),
        F.lit(None).cast("double").alias("r_value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_left"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    joined = (
        purchases.unionByName(views)
        .withColumn("m_ts", F.last("r_ts", ignorenulls=True).over(w))
        .withColumn("m_value", F.last("r_value", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .withColumn("matched", F.col("m_ts").isNotNull())
        .withColumn(
            "fresh",
            F.col("m_ts").isNotNull()
            & (us("ts") - us("m_ts") <= _TOL_MIN * 60_000_000),
        )
    )
    return joined.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("purchase_ts"),
        F.when(F.col("fresh"), ts_str("m_ts")).alias("last_view_ts"),
        F.when(F.col("fresh"), F.col("m_value")).alias("last_view_value"),
        (F.col("matched") & ~F.col("fresh")).alias("dropped_stale"),
    )


_RP_MAX_K = 10


@register(
    "orders_repeat_purchase_curve",
    oracle=f"""
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
), tot AS (SELECT COUNT(*) AS n_cust FROM per_cust),
grid AS (SELECT UNNEST(range(1, {_RP_MAX_K} + 1)) AS k)
SELECT g.k,
       CAST(COUNT(*) FILTER (WHERE p.n_orders >= g.k) AS BIGINT)
         AS n_customers_at_k,
       round(CAST(COUNT(*) FILTER (WHERE p.n_orders >= g.k) AS DOUBLE)
             / MAX(t.n_cust), 6) AS frac_customers,
       round(CAST(COUNT(*) FILTER (WHERE p.n_orders >= g.k + 1) AS DOUBLE)
             / NULLIF(COUNT(*) FILTER (WHERE p.n_orders >= g.k), 0), 6)
         AS next_order_prob
FROM grid g CROSS JOIN per_cust p CROSS JOIN tot t
GROUP BY g.k
ORDER BY g.k
""",
    description=f"Repeat-purchase curve: for k = 1..{_RP_MAX_K}, the "
    "number and fraction of customers who ever placed ≥ k orders, plus "
    "the conditional next-order probability P(≥k+1 | ≥k) — the "
    "retention curve whose flattening conditional probabilities are "
    "the classic buy-till-you-die signature (the empirical input to "
    "BG/NBD-style lifetime models, and the orders-side sibling of "
    "events_retention_cohorts). Exact integers throughout; the "
    "k-grid explode multiplies the CUSTOMER domain (already one "
    "aggregate down from orders) by 10, not the fact table. Shape: "
    "one per-customer count, one grid aggregate.",
    tags=("orders", "retention", "agg"),
)
def orders_repeat_purchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    tot = per_cust.agg(F.count(F.lit(1)).alias("n_cust"))
    grid = per_cust.crossJoin(F.broadcast(tot)).select(
        "n_orders",
        "n_cust",
        F.explode(F.sequence(F.lit(1), F.lit(_RP_MAX_K))).alias("k"),
    )
    at_k = F.count(F.when(F.col("n_orders") >= F.col("k"), 1))
    at_k1 = F.count(F.when(F.col("n_orders") >= F.col("k") + 1, 1))
    return (
        grid.groupBy("k")
        .agg(
            at_k.cast("bigint").alias("n_customers_at_k"),
            F.round(at_k.cast("double") / F.max("n_cust"), 6).alias(
                "frac_customers"
            ),
            F.round(
                at_k1.cast("double") / F.nullif(at_k.cast("double"), F.lit(0.0)), 6
            ).alias("next_order_prob"),
        )
        
    )
