"""Second wave of the generic relational surface (SURVEY.md §2.12):
right/bag set ops, grouping sets, HAVING, approx-distinct, value-window
frames, rank-family windows, global top-K, and TPC-H Q6/Q10 shapes.

Same determinism rules as plans/relational.py: money sums through exact
decimals, formatted timestamps, total orders under every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import (
    dec,
    dsum,
    register,
    t,
    ts_str,
)

# ---------------------------------------------------------------------------
# TPC-H shapes
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    description="TPC-H Q6-style forecast revenue: pure filtered scan + "
    "ungrouped agg. Every predicate reaches the parquet scan (PushedFilters) "
    "— the canonical pushdown check.",
    tags=("agg", "scan"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount", "decimal(4,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register(
    "q10_returned_items",
    oracle=_Q10_ORACLE,
    description="TPC-H Q10-style returned-item report: fact-fact shuffle "
    "join on orderkey, then broadcast joins for customer-side dims, grouped "
    "revenue, global top-20 (TakeOrderedAndProject — no full sort).",
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    rev = dec("l_extendedprice") * (1 - dec("l_discount", "decimal(4,2)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Joins / set ops
# ---------------------------------------------------------------------------


@register(
    "join_right_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
""",
    description="Right outer join: customers kept even with zero orders "
    "(null-extended order side). Spark plans it as the mirrored left outer.",
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "right"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "set_intersect_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    description="Bag intersection (multiplicity = min of the two sides) — "
    "customers appearing with both statuses, kept per-occurrence.",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    description="Bag difference (multiplicity = left minus right, floored "
    "at zero).",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------


@register(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
""",
    description="Explicit GROUPING SETS (a non-hierarchical mix rollup/cube "
    "can't express): per-(flag,status), per-status, grand total.",
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "agg_having_filter",
    oracle="""
SELECT l_orderkey,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_orderkey
HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) > 150
""",
    description="HAVING = post-aggregation filter (TPC-H Q18 inner shape): "
    "orders whose total quantity exceeds the threshold.",
    tags=("agg",),
)
def agg_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )


@register(
    "agg_approx_distinct",
    # Epsilon-bound oracle: the sketch estimate itself is engine-specific,
    # so the VERIFIED output is the exact count plus a boolean asserting the
    # HLL++ estimate landed within its advertised error band (default
    # rsd=0.05 → we check |est-exact|/exact <= 4*rsd, a ~4-sigma bound that
    # is deterministic-tight in practice). The oracle emits TRUE, so a
    # hash match PROVES the sketch was within epsilon of exact.
    oracle="""
SELECT o_orderpriority,
       TRUE AS approx_within_eps,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="approx_count_distinct (HyperLogLog++) next to the exact "
    "count per group: the 100 TB cardinality-estimation path (no "
    "expand+two-phase shuffle, fixed-size sketch). The oracle verifies an "
    "epsilon bound: output carries |approx-exact|/exact <= 0.20 (4x the "
    "default rsd) as a boolean the DuckDB side asserts TRUE, so the hash "
    "match certifies the estimate quality without requiring bit-identical "
    "engine-specific sketch values.",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    agged = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey").alias("approx_customers"),
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return agged.select(
        "o_orderpriority",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            / F.col("exact_customers")
            <= F.lit(0.20)
        ).alias("approx_within_eps"),
        "exact_customers",
        "n_orders",
    )


@register(
    "agg_stats_suite",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n_rows,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows,
       sx / n_rows AS mean_qty,
       sqrt((sxx - sx * sx / n_rows) / (n_rows - 1)) AS std_qty,
       sqrt((syy - sy * sy / n_rows) / (n_rows - 1)) AS std_price,
       (sxy - sx * sy / n_rows) / (n_rows - 1) AS covar_qp,
       ((sxy - sx * sy / n_rows) / (n_rows - 1))
         / (sqrt((sxx - sx * sx / n_rows) / (n_rows - 1))
            * sqrt((syy - sy * sy / n_rows) / (n_rows - 1))) AS corr_qp
FROM s
""",
    description="Statistical moments built deterministically from exact "
    "decimal power sums (classic one-pass sufficient statistics): stddev, "
    "covariance, correlation. Native stddev/corr aggregate doubles in "
    "partition order and drift cross-engine; power sums are exact, and the "
    "final IEEE arithmetic is identical in both engines.",
    tags=("agg", "stats"),
)
def agg_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = dec("l_quantity")
    y = dec("l_extendedprice")
    s = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    n = F.col("n_rows")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    covar = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    return s.select(
        "l_returnflag",
        "n_rows",
        (F.col("sx") / n).alias("mean_qty"),
        F.sqrt(var_x).alias("std_qty"),
        F.sqrt(var_y).alias("std_price"),
        covar.alias("covar_qp"),
        (covar / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_qp"),
    )


@register(
    "agg_exact_median",
    oracle="""
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
  FROM orders
)
SELECT o_orderstatus,
       AVG(o_totalprice) AS median_price,
       MAX(cnt) AS n_rows
FROM ranked
WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
   OR rn = CAST(floor((cnt + 2) / 2) AS BIGINT)
GROUP BY o_orderstatus
""",
    description="Exact median without a percentile primitive: row_number + "
    "partition count select the middle element(s); even-sized groups "
    "average the two middles. Fully deterministic in both engines (native "
    "percentile interpolation orders are engine-specific).",
    tags=("agg", "window", "stats"),
)
def agg_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    wo = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderstatus")
    ranked = t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    lo = F.floor((F.col("cnt") + 1) / 2).cast("bigint")
    hi = F.floor((F.col("cnt") + 2) / 2).cast("bigint")
    return (
        ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
        .groupBy("o_orderstatus")
        .agg(
            F.avg("o_totalprice").alias("median_price"),
            F.max("cnt").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Window variants
# ---------------------------------------------------------------------------


@register(
    "window_ntile_percent",
    oracle="""
SELECT c_custkey, c_nationkey,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
    description="Rank-family windows: ntile quartiles, percent_rank, "
    "cume_dist per nation. Total order (acctbal, custkey) makes the "
    "assignment deterministic.",
    tags=("window",),
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) OVER (
           PARTITION BY user_id
           ORDER BY CAST(epoch(ts) AS BIGINT)
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS DOUBLE) AS rolling_1h_sum
FROM events
""",
    description="RANGE frame over event time (trailing 1 hour per user) — "
    "a value-based frame, not a row count; peers at the same timestamp "
    "aggregate together so tie order can't change the result. Decimal sum "
    "keeps the frame aggregation order-independent.",
    tags=("window", "streaming"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn(
        "epoch", F.unix_timestamp(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("ts_s"),
        F.sum(F.col("value").cast("decimal(20,10)"))
        .over(w)
        .cast("double")
        .alias("rolling_1h_sum"),
    )


@register(
    "window_first_last",
    oracle="""
SELECT o_orderkey, o_custkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey)  OVER w AS last_order,
       nth_value(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    description="first/last/nth value over an unbounded frame: each "
    "customer's chronological first, last, and second order.",
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
""",
    description="Global top-K by value: orderBy+limit plans as "
    "TakeOrderedAndProject (per-partition partial top-K merged on the "
    "driver — no full shuffle/sort at any scale).",
    tags=("topk",),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(15)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            ts_str("o_orderdate").alias("order_date"),
        )
    )
