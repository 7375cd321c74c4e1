"""Third relational wave — the remaining TPC-H query *shapes*, adapted to
this corpus (no partsupp table; lineitem has no shipmode/commitdate), plus a
product-analytics funnel over ``events``.

Shapes covered here and why they matter at 100 TB:

* q4   — EXISTS → left-semi join with a non-equi residual condition.
* q7   — 4-way fact/dim join with two roles for one dim (nation²), year agg.
* q9   — profit rollup: fact×2 dims, derived decimal arithmetic, (nation,year).
* q13  — outer-join-then-histogram (distribution of counts).
* q14  — conditional aggregate ratio (promo share) in one pass.
* q15  — agg → global-max equality (argmax via single-row broadcast).
* q16  — count-distinct per group after a broadcast dim join with NOT filters.
* q17  — correlated scalar avg per part → anti-selective residual filter.
* q18  — group-HAVING on a fact, then join back to dims, global top-K.
* q19  — disjunction of bracket predicates (tests OR pushdown + CNF).
* q22  — scalar subquery threshold + anti join (customers with no orders).
* funnel — min-timestamp-per-stage conversion funnel (events), exact seconds.

Determinism: money sums go through DECIMAL(18,2) (see registry docstring);
year() is exact; timestamp diffs are whole seconds (exact bigints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import (
    dec,
    dsum,
    register,
    t,
)

_DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _disc_price() -> F.Column:
    return dec("l_extendedprice") * (1 - dec("l_discount", "decimal(4,2)"))


# ---------------------------------------------------------------------------
# q4 — order priority checking (EXISTS → semi join)
# ---------------------------------------------------------------------------

@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    description="TPC-H Q4 shape: date-windowed orders with EXISTS(lineitem "
    "shipped after order date) → left-semi hash join carrying a non-equi "
    "residual; only priorities cross the final shuffle.",
    tags=("join", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations, by year
# ---------------------------------------------------------------------------

@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         {_DISC_PRICE} AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
""",
    description="TPC-H Q7 shape: lineitem⋈supplier⋈orders⋈customer with "
    "nation joined twice under different roles. supplier/customer/nation are "
    "broadcast; only the orders join shuffles, and AQE can flip it to "
    "broadcast once the nation filters collapse the build side.",
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sup = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q9 — profit by nation and year (adapted: flat per-unit cost, no partsupp)
# ---------------------------------------------------------------------------

@register(
    "q9_profit_by_nation",
    oracle=f"""
SELECT nation, o_year, CAST(CAST(SUM(amount) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         {_DISC_PRICE}
           - CAST(10.00 AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE p_type = 'PROMO'
)
GROUP BY nation, o_year
""",
    description="TPC-H Q9 shape (no partsupp in this corpus → flat 10.00/unit "
    "cost): fact × part/supplier/nation broadcast dims × orders shuffle join; "
    "derived decimal profit; (nation, year) rollup.",
    tags=("join", "agg"),
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    amount = _disc_price() - dec(F.lit(10.00), "decimal(4,2)") * dec("l_quantity")
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (outer join → histogram)
# ---------------------------------------------------------------------------

@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    description="TPC-H Q13 shape: left-outer join keeping order-less "
    "customers (COUNT of NULL join rows = 0), then a second aggregation "
    "producing the histogram of per-customer order counts.",
    tags=("join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q14 — promo revenue share (conditional aggregate ratio)
# ---------------------------------------------------------------------------

@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT CAST(CAST(100.00 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
       / CAST(CAST(SUM({_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-03-01 00:00:00'
""",
    description="TPC-H Q14 shape: single-pass conditional aggregate ratio "
    "(promo share of revenue) over a date-pruned scan with a broadcast part "
    "join — two decimal sums, one deterministic double division.",
    tags=("agg", "join"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    dp = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", dp).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                F.lit(100.00)
                * F.sum(promo).cast("double")
                / F.sum(dp).cast("double")
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q15 — top supplier by revenue (agg → global max equality)
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_DISC_PRICE}) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
""",
    description="TPC-H Q15 shape: quarterly per-supplier revenue, then keep "
    "the argmax row(s) by comparing against a broadcast single-row global max "
    "— exact decimal comparison, so cross-engine equality is safe.",
    tags=("agg", "subquery", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("rev_dec")
    )
    max_rev = revenue.agg(F.max("rev_dec").alias("max_rev"))
    sup = t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("rev_dec") == F.col("max_rev"))
        .join(sup, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q16 — supplier variety per part group (count-distinct after dim join)
# ---------------------------------------------------------------------------

@register(
    "q16_supplier_variety",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 14, 23, 45)
GROUP BY p_brand, p_type, p_size
""",
    description="TPC-H Q16 shape (partsupp → lineitem as the part-supplier "
    "relation): NOT-equal + IN-list dim filters pushed into a broadcast join, "
    "then count-distinct suppliers per (brand, type, size) — Spark expands "
    "it to a two-phase distinct aggregate.",
    tags=("agg", "join"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 14, 23, 45)
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity revenue (correlated scalar avg per part)
# ---------------------------------------------------------------------------

@register(
    "q17_small_qty_revenue",
    oracle="""
SELECT CAST(CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / 7.0 AS VARCHAR) AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
""",
    description="TPC-H Q17 shape: correlated scalar AVG per part decorrelated "
    "into a per-part aggregate joined back to the fact (Catalyst rewrites the "
    "subquery the same way); quantities are integers so the avg is exact.",
    tags=("subquery", "agg", "join"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part_avg, F.col("avg_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# q18 — large-volume customers (HAVING on fact, join back, top-K)
# ---------------------------------------------------------------------------

@register(
    "q18_large_volume_customers",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o_totalprice,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    description="TPC-H Q18 shape: HAVING-filtered per-order quantity sums "
    "(semi-join back to the fact), customer/orders join, global top-100 by "
    "price — TakeOrderedAndProject, never a full sort.",
    tags=("agg", "join", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One lineitem scan: the HAVING aggregate already yields the per-order
    # quantity sum the projection needs, so (unlike the textbook Q18 plan,
    # which semi-joins back into lineitem and re-aggregates post-join) the
    # filtered aggregate joins straight to orders/customer — no second
    # scan, no second big shuffle, same result.
    li = t(spark, sf_dir, "lineitem")
    big_orders = li.groupBy("l_orderkey").agg(
        F.sum(dec("l_quantity")).alias("qty_dec")
    ).filter(F.col("qty_dec") > 250)
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        big_orders.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 — bracketed OR predicates (discounted revenue)
# ---------------------------------------------------------------------------

@register(
    "q19_bracket_revenue",
    oracle=f"""
SELECT CAST(CAST(SUM({_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    description="TPC-H Q19 shape: disjunction of three (brand, size, "
    "quantity) brackets across the join — Catalyst extracts the common "
    "per-side conjuncts so both scans still prune before the join.",
    tags=("join", "agg"),
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(b1 | b2 | b3).agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
# q22 — dormant rich customers (scalar threshold + anti join)
# ---------------------------------------------------------------------------

@register(
    "q22_dormant_customers",
    oracle="""
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
FROM (
  SELECT c_nationkey % 5 AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                            / COUNT(*)
                     FROM customer WHERE c_acctbal > 0.00)
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
)
GROUP BY cntrycode
""",
    description="TPC-H Q22 shape: scalar subquery (exact-decimal mean "
    "acctbal) broadcast as a 1-row threshold, NOT EXISTS → left-anti join "
    "against orders (every customer here has *some* order, so the dormancy "
    "predicate is 'no urgent orders'), grouped by a derived country code.",
    tags=("subquery", "join", "agg"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    threshold = (
        cust.filter(F.col("c_acctbal") > 0.00)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    rich = (
        cust.join(F.broadcast(threshold), F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    )
    return (
        rich.select(
            (F.col("c_nationkey") % 5).alias("cntrycode"), F.col("c_acctbal")
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# events funnel — staged conversion with exact time-to-convert
# ---------------------------------------------------------------------------

@register(
    "events_funnel_conversion",
    oracle="""
SELECT COUNT(*) AS n_converted,
       CAST(CAST(SUM(epoch_us(t_purchase) - epoch_us(t_view)) AS VARCHAR) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_view_to_purchase_sec
FROM (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
WHERE t_view < t_click AND t_click < t_purchase
""",
    description="Conversion funnel over the events stream table: first "
    "view→click→purchase per user in strict order, one hash aggregate per "
    "user then a global rollup; time-to-convert is exact bigint micros "
    "summed before one double division per engine. The product-analytics "
    "shape (sessionized funnels) a training-data pipeline runs over "
    "interaction logs.",
    tags=("agg", "events"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    stage = lambda name: F.min(  # noqa: E731
        F.when(F.col("event_type") == name, F.col("ts"))
    )
    per_user = ev.groupBy("user_id").agg(
        stage("view").alias("t_view"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    converted = per_user.filter(
        (F.col("t_view") < F.col("t_click")) & (F.col("t_click") < F.col("t_purchase"))
    )
    return converted.agg(
        F.count(F.lit(1)).alias("n_converted"),
        (
            F.sum(
                F.unix_micros(F.col("t_purchase").cast("timestamp"))
                - F.unix_micros(F.col("t_view").cast("timestamp"))
            ).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0)
        ).alias("avg_view_to_purchase_sec"),
    )


# ---------------------------------------------------------------------------
# events retention — weekly cohort matrix
# ---------------------------------------------------------------------------

@register(
    "events_retention_cohorts",
    oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM events
  GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT strftime(cohort_week, '%Y-%m-%d %H:%M:%S') AS cohort_week,
       (CAST(epoch(active_week) AS BIGINT)
        - CAST(epoch(cohort_week) AS BIGINT)) // 604800 AS week_offset,
       COUNT(*) AS n_users
FROM activity JOIN first_seen USING (user_id)
GROUP BY 1, 2
""",
    description="Weekly retention cohort matrix over the events stream: "
    "cohort = Monday-truncated week of each user's first event, offset = "
    "whole weeks since (exact bigint epoch arithmetic), cell = distinct "
    "active users. Two user_id-partitioned aggregates share one shuffle; "
    "the (cohort, offset) rollup moves only group rows. The standard "
    "engagement shape a training-data pipeline computes over interaction "
    "logs.",
    tags=("agg", "events"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd HH:mm:ss").alias("cohort_week"),
            (
                (
                    F.unix_timestamp(F.col("active_week").cast("timestamp"))
                    - F.unix_timestamp(F.col("cohort_week").cast("timestamp"))
                )
                / F.lit(604800)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# cross join + bag union (the §2.12 set/join shapes not yet named)
# ---------------------------------------------------------------------------

@register(
    "join_cross_grid",
    oracle="""
SELECT r_name, n_name, r_regionkey * 100 + n_nationkey AS grid_code
FROM region CROSS JOIN nation
""",
    description="Explicit Cartesian product of the two smallest dims (5×25) "
    "— the dimension-grid shape (every region × every nation). Planned as "
    "BroadcastNestedLoopJoin; never valid between facts at scale, which is "
    "why every other pair-generating query here blocks or buckets first.",
    tags=("join",),
)
def join_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = t(spark, sf_dir, "region")
    nation = t(spark, sf_dir, "nation")
    return region.crossJoin(F.broadcast(nation)).select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") * 100 + F.col("n_nationkey")).alias("grid_code"),
    )


@register(
    "set_union_all_priorities",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n
FROM (
  SELECT o_orderpriority FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  UNION ALL
  SELECT o_orderpriority FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
)
GROUP BY o_orderpriority
""",
    description="Bag union (unionAll, duplicates preserved — overlapping "
    "date slices count twice) then a counting rollup; the union is a "
    "zero-shuffle concatenation of the two pruned scans.",
    tags=("setop", "agg"),
)
def set_union_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")

    def sl(lo: str, hi: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        ).select("o_orderpriority")

    return (
        sl("1996-01-01", "1997-01-01")
        .unionAll(sl("1996-07-01", "1997-07-01"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# skew mitigation — salted join / salted two-phase agg (oracle = unsalted)
# ---------------------------------------------------------------------------

@register(
    "join_salted_skew",
    oracle=f"""
SELECT o_orderpriority,
       CAST(CAST(SUM({_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
    description="Salted equi-join (8 deterministic salts: lineitem side "
    "hashed on non-key cols, orders side exploded ×8) proving the skew "
    "rewrite is semantics-preserving — the oracle is the PLAIN join. "
    "Shuffle key (orderkey, salt) bounds any hot key's task at 1/8 of its "
    "rows; the tool for joins AQE can't split (operators/skew.py).",
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import skew

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = skew.salted_join(
        li, orders, "l_orderkey", "o_orderkey",
        salt_from=["l_linenumber", "l_partkey"], n_salt=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "agg_salted_skew",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    description="Salted two-phase aggregation (partial per (key, salt), "
    "final per key) for monster-group keys AQE can't split — 3 return "
    "flags over 600k rows is exactly the cardinality regime. Oracle is the "
    "plain GROUP BY; decimal sums make the two-phase merge exact.",
    tags=("agg", "skew"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import skew

    li = t(spark, sf_dir, "lineitem")
    res = skew.salted_sum_count(
        li,
        group_keys=["l_returnflag"],
        sum_cols={"sum_qty": dec("l_quantity")},
        salt_from=["l_orderkey", "l_linenumber"],
        n_salt=8,
    )
    return res.select(
        "l_returnflag", F.col("sum_qty").cast("double").alias("sum_qty"), "n_rows"
    )


# ---------------------------------------------------------------------------
# q8 — market share (ratio of conditional sum to total sum, per year)
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
       CAST(CAST(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
            / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         {_DISC_PRICE} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'EUROPE'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_year
""",
    description="TPC-H Q8 shape: one nation's share of a region's order "
    "volume per year — conditional decimal sum over total decimal sum, one "
    "pass, one group shuffle; six-table join with nation in both customer "
    "and supplier roles, all dims broadcast.",
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = _disc_price()
    joined = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n1_region"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
    )
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_3", volume
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            nation_vol.alias("nation_volume"),
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum("nation_volume").cast("double")
                / F.sum("volume").cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# q21 — sole late supplier (EXISTS + NOT EXISTS, both correlated to the fact)
# ---------------------------------------------------------------------------

@register(
    "q21_sole_late_supplier",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM li l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
""",
    description="TPC-H Q21 shape (no receiptdate in this corpus → late = "
    "shipped >90 days after order date): the double-correlated pattern — "
    "EXISTS(another supplier in the order) AND NOT EXISTS(another LATE "
    "supplier in the order) — decorrelated into a left-semi then left-anti "
    "hash join on the same shuffle key, with non-equi supplier residuals. "
    "Both probes reuse the orderkey partitioning; supplier is broadcast.",
    tags=("join", "subquery", "agg"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    late = li.filter(is_late)
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    sole_late = (
        late.join(
            others,
            (F.col("ok2") == F.col("l_orderkey")) & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("ok3") == F.col("l_orderkey")) & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    sup = t(spark, sf_dir, "supplier")
    return (
        sole_late.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q11 — groups above a fraction of the global total
# ---------------------------------------------------------------------------

@register(
    "q11_important_parts",
    oracle=f"""
WITH r AS (
  SELECT l_partkey, SUM({_DISC_PRICE}) AS rev_dec
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT SUM(rev_dec) AS total_dec FROM r)
SELECT l_partkey, CAST(rev_dec AS DOUBLE) AS revenue
FROM r, tot
WHERE CAST(rev_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.0008
""",
    description="TPC-H Q11 shape (no partsupp → per-part revenue): keep "
    "groups whose sum exceeds a fraction of the GLOBAL total — the "
    "same-aggregate-twice pattern where the scalar total re-aggregates the "
    "grouped result (no second fact scan) and broadcasts as a 1-row join; "
    "exact decimal sums make the threshold comparison engine-stable.",
    tags=("agg", "subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("rev_dec"))
    total = per_part.agg(F.sum("rev_dec").alias("total_dec"))
    return (
        per_part.join(
            F.broadcast(total),
            F.col("rev_dec").cast("double")
            > F.col("total_dec").cast("double") * 0.0008,
        )
        .select("l_partkey", F.col("rev_dec").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q12 — shipping tiers × priority classes (dual conditional counts)
# ---------------------------------------------------------------------------

@register(
    "q12_late_shipment_tiers",
    oracle="""
SELECT ship_tier,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM (
  SELECT CASE WHEN l_quantity > 25 THEN 'BULK' ELSE 'SMALL' END AS ship_tier,
         o_orderpriority
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    AND l_shipdate < o_orderdate + INTERVAL 120 DAY
)
GROUP BY ship_tier
""",
    description="TPC-H Q12 shape (no shipmode column → quantity tiers): "
    "late-shipped lines bucketed BULK/SMALL with dual conditional priority "
    "counts — one pass, one two-group shuffle, the date-window residual "
    "evaluated inside the join.",
    tags=("join", "agg"),
)
def q12_late_shipment_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    joined = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).filter(
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.select(
            F.when(F.col("l_quantity") > 25, "BULK").otherwise("SMALL").alias(
                "ship_tier"
            ),
            high.alias("is_high"),
        )
        .groupBy("ship_tier")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q20 — dominant suppliers (hierarchical re-aggregation + ratio threshold)
# ---------------------------------------------------------------------------

@register(
    "q20_dominant_suppliers",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey, SUM(qty) AS tqty FROM ps GROUP BY l_partkey
)
SELECT s_suppkey, s_name, COUNT(*) AS n_dominant_parts
FROM ps JOIN tot USING (l_partkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE CAST(qty AS DOUBLE) > 0.15 * CAST(tqty AS DOUBLE)
GROUP BY s_suppkey, s_name
""",
    description="TPC-H Q20 shape (no partsupp → lineitem as the supply "
    "relation): suppliers who shipped >15% of a part's volume, counted per "
    "supplier. Hierarchical re-aggregation — (part, supplier) sums roll up "
    "to part totals WITHOUT rescanning the fact; the ratio join re-uses "
    "the first aggregate from both sides.",
    tags=("agg", "join", "subquery"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("qty")
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("qty").alias("tqty"))
    sup = t(spark, sf_dir, "supplier")
    return (
        ps.join(tot, "l_partkey")
        .filter(F.col("qty").cast("double") > 0.15 * F.col("tqty").cast("double"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
    )


# ---------------------------------------------------------------------------
# q2 — argmin per group with join-back (min-cost supplier)
# ---------------------------------------------------------------------------

@register(
    "q2_min_balance_supplier",
    oracle="""
WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
j AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal
  FROM part
  JOIN rel ON l_partkey = p_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE p_size = 15 AND p_type = 'SMALL'
)
SELECT p_partkey, s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM j
WHERE s_acctbal = (SELECT MIN(j2.s_acctbal) FROM j j2
                   WHERE j2.p_partkey = j.p_partkey)
""",
    description="TPC-H Q2 shape (lineitem as the part-supplier relation): "
    "for each qualifying part, the supplier(s) with minimum account "
    "balance — correlated MIN decorrelated to a per-part window min with "
    "equality join-back; ties keep all argmin rows deterministically.",
    tags=("subquery", "join", "window"),
)
def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    rel = li.select("l_partkey", "l_suppkey").distinct()
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    sup = t(spark, sf_dir, "supplier")
    j = (
        rel.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# events time-series similarity — behavioral top-k (cf. EDBT'19/'20 papers)
# ---------------------------------------------------------------------------

_SQL_UCOS = (
    "round(list_dot_product(a.v, q.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.v, q.v))), 6)"
)


@register(
    "events_similar_users",
    oracle=f"""
WITH vec AS (
  SELECT user_id,
         [{", ".join(
             "CAST(CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) = " + str(d)
             + " THEN 1 ELSE 0 END) AS VARCHAR) AS DOUBLE)"
             for d in range(7)
         )}] AS v
  FROM events GROUP BY user_id
), q AS (
  SELECT * FROM vec ORDER BY user_id LIMIT 10
)
SELECT query_user, neighbor_user, cos_sim, rank FROM (
  SELECT q.user_id AS query_user, a.user_id AS neighbor_user,
         {_SQL_UCOS} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q.user_id
                            ORDER BY {_SQL_UCOS} DESC, a.user_id) AS rank
  FROM vec a CROSS JOIN q
  WHERE a.user_id != q.user_id
) WHERE rank <= 3
""",
    description="Time-series similarity search over the event stream "
    "(the distributed-similarity-search shape from the retrieved EDBT "
    "papers): each user's behavior becomes a 7-dim day-of-week activity "
    "vector (exact integer counts cast to double), then cosine top-3 "
    "neighbors for the 10 lowest-id users — broadcast-query scan, "
    "per-partition top-K, same plan family as the embedding ANN path, so "
    "the LSH/IVF variants apply unchanged when the vector dimension grows.",
    tags=("events", "similarity", "window"),
)
def events_similar_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import vectors as V

    ev = t(spark, sf_dir, "events")
    # Spark dayofweek() is 1-7 (Sunday=1); DuckDB EXTRACT(dow) is 0-6
    # (Sunday=0) — align by indexing Spark's value minus one.
    vec = ev.groupBy("user_id").agg(
        F.array(
            *[
                F.sum(
                    F.when(F.dayofweek("ts") == d + 1, 1).otherwise(0)
                ).cast("double")
                for d in range(7)
            ]
        ).alias("v")
    )
    queries = vec.orderBy("user_id").limit(10).select(
        F.col("user_id").alias("query_user"), F.col("v").alias("qv")
    )
    a = vec.select(
        F.col("user_id").alias("neighbor_user"),
        F.col("v").alias("av"),
        V.norm(F.col("v")).alias("a_norm"),
    )
    q = F.broadcast(
        queries.select(
            "query_user", "qv", V.norm(F.col("qv")).alias("q_norm")
        )
    )
    scored = (
        a.crossJoin(q)
        .filter(F.col("neighbor_user") != F.col("query_user"))
        .select(
            "query_user",
            "neighbor_user",
            F.round(
                V.cosine_from_norms(
                    F.col("av"), F.col("qv"), F.col("a_norm"), F.col("q_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_user").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_user")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 3
    )


# ---------------------------------------------------------------------------
# deterministic mode — most frequent value per group (argmax of counts)
# ---------------------------------------------------------------------------

@register(
    "agg_mode_per_group",
    oracle="""
WITH c AS (
  SELECT o_orderpriority, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS n
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1, 2
)
SELECT o_orderpriority, qty AS modal_qty, n AS n_occurrences
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY n DESC, qty) AS rn
  FROM c
) WHERE rn = 1
""",
    description="Deterministic per-group mode: most frequent quantity per "
    "order priority via count-then-argmax (row_number with a value "
    "tiebreak) — the portable form of MODE(), whose tie behavior is "
    "engine-defined. Two aggregations share one shuffle; the argmax window "
    "runs over the already-tiny count table.",
    tags=("agg", "window"),
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    counts = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority", F.col("l_quantity").cast("bigint").alias("qty"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("n"), F.asc("qty"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("qty").alias("modal_qty"),
            F.col("n").alias("n_occurrences"),
        )
    )
