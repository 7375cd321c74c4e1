"""Generic relational operator surface (SURVEY.md §2.12) over the TPC-H-ish
corpus — joins, grouped aggregation, windows, set ops, scalar suites.

Every query is written DataFrame-first and carries a DuckDB oracle string.
Plans are Catalyst-friendly: filters sit next to scans (pushdown), small
dimensions are broadcast, top-Ks are orderBy+limit (TakeOrderedAndProject),
aggregates are partial+final automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import (
    davg,
    dec,
    dsum,
    register,
    t,
    ts_str,
)

# ---------------------------------------------------------------------------
# Grouped aggregation
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "q1_pricing_summary",
    oracle=_Q1_ORACLE,
    description="TPC-H Q1-style pricing summary: filtered scan → grouped "
    "exact-decimal aggregates. Partial aggregation map-side; only "
    "(flag,status) groups cross the shuffle.",
    tags=("agg",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount", "decimal(4,2)"))
    charge = disc_price * (1 + dec("l_tax", "decimal(4,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct_counts",
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price,
       CAST(CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS min_price,
       CAST(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS max_price
FROM orders GROUP BY o_orderstatus
""",
    description="Grouped agg with COUNT DISTINCT (expand+two-phase agg in "
    "Spark — no extra shuffle beyond the group key).",
    tags=("agg",),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
            F.min(dec("o_totalprice")).cast("double").alias("min_price"),
            F.max(dec("o_totalprice")).cast("double").alias("max_price"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    description="ROLLUP hierarchy totals (grand total + per-flag subtotals).",
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    description="CUBE over two dimensions — all grouping-set combinations.",
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS O,
       CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS F
FROM lineitem GROUP BY l_returnflag
""",
    description="Pivot linestatus into columns (conditional aggregation).",
    tags=("agg",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    description="DISTINCT = hash aggregate on the projected key.",
    tags=("agg",),
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register(
    "q3_shipping_priority",
    oracle=_Q3_ORACLE,
    description="TPC-H Q3-style: selective dim filter broadcast into two "
    "fact joins, grouped revenue, total-ordered top-10.",
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = dec("l_extendedprice") * (1 - dec("l_discount", "decimal(4,2)"))
    return (
        li.join(orders.join(cust, orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            ts_str("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register(
    "q5_local_supplier_volume",
    oracle=_Q5_ORACLE,
    description="TPC-H Q5-style six-way join; dims broadcast, single fact "
    "shuffle on orderkey; revenue per nation.",
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice") * (1 - dec("l_discount", "decimal(4,2)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS VARCHAR) AS DOUBLE) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
    description="Left outer join preserving order-less customers.",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("total_spent"),
        )
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    description="Left-semi join (EXISTS): customers with a 300k+ order.",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    description="Left-anti join (NOT EXISTS): customers with no orders.",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_full_outer",
    oracle="""
WITH cu AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
     su AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(cu.nk, su.nk) AS nationkey, cu.n_cust, su.n_supp
FROM cu FULL OUTER JOIN su ON cu.nk = su.nk
""",
    description="Full outer join of two aggregates (nations with only "
    "customers or only suppliers survive with NULLs).",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    su = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cu.join(su, "nk", "full_outer").select(
        F.coalesce(cu.nk, su.nk).alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "join_theta_range",
    oracle="""
SELECT p_brand, COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
                        AND l_quantity BETWEEN p_size - 5 AND p_size + 5
GROUP BY p_brand
""",
    description="Equi join with a range (theta) residual predicate; part is "
    "broadcast so the band filter evaluates map-side.",
    tags=("join",),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        li.join(
            part,
            (li.l_partkey == part.p_partkey)
            & (li.l_quantity >= part.p_size - 5)
            & (li.l_quantity <= part.p_size + 5),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "join_asof",
    oracle="""
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts,
       CAST(v.value AS DOUBLE) AS last_view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
    description="As-of join: for each purchase, the most recent prior view "
    "per user. Spark expresses it as union + last(ignoreNulls) window — one "
    "shuffle on user_id, no range-join explosion.",
    tags=("join", "window"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_left"),
        F.lit(None).cast("timestamp").alias("r_ts"), F.lit(None).cast("double").alias("r_value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.lit(None).cast("bigint").alias("event_id"), "user_id", "ts",
        F.lit(0).alias("is_left"), F.col("ts").alias("r_ts"), F.col("value").alias("r_value"),
    )
    unioned = purchases.unionByName(views)
    # right rows sort before left rows at equal ts (is_left asc) → ties match
    # DuckDB ASOF's p.ts >= v.ts semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_view_ts", F.last("r_ts", ignorenulls=True).over(w))
        .withColumn("last_view_value", F.last("r_value", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("purchase_ts"),
            ts_str("last_view_ts").alias("last_view_ts"),
            F.col("last_view_value").cast("double").alias("last_view_value"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@register(
    "window_topk_per_group",
    oracle="""
SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn FROM (
  SELECT c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM customer JOIN orders ON c_custkey = o_custkey
) WHERE rn <= 3
""",
    description="Top-3 orders per customer — row_number window + filter "
    "(the scalable per-group top-K; no global sort).",
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_custkey", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "rn",
        )
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT user_id, event_id, event_type,
       CAST(value AS DOUBLE) AS value,
       CAST(LAG(value)  OVER w AS DOUBLE) AS prev_value,
       CAST(LEAD(value) OVER w AS DOUBLE) AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    description="lag/lead over per-user event sequences.",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.lag("value").over(w).cast("double").alias("prev_value"),
        F.lead("value").over(w).cast("double").alias("next_value"),
    )


@register(
    "window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS running_spent
FROM orders
""",
    description="Running total per customer (rows frame, exact decimal).",
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spent"),
    )


@register(
    "window_rank_dense",
    oracle="""
SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       RANK()       OVER w AS bal_rank,
       DENSE_RANK() OVER w AS bal_dense_rank,
       NTILE(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
""",
    description="rank / dense_rank / ntile within nation by balance.",
    tags=("window",),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    wt = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(wt).alias("bal_quartile"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@register(
    "set_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
    description="INTERSECT of two user sets.",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "set_except",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
""",
    description="EXCEPT: viewers who never errored.",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    errs = ev.filter(F.col("event_type") == "error").select("user_id")
    return views.subtract(errs)


@register(
    "set_union_distinct",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
""",
    description="UNION (distinct) of two key sets, schema aligned by name.",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    big = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return rich.unionByName(big).distinct()


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------

@register(
    "subquery_scalar_avg",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                             / COUNT(*) FROM orders)
GROUP BY o_orderpriority
""",
    description="Scalar subquery threshold (deterministic decimal average); "
    "Spark side computes the scalar and broadcasts it as a literal join.",
    tags=("subquery",),
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    avg_df = orders.agg(davg("o_totalprice").alias("avg_price"))
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


@register(
    "subquery_correlated_max",
    oracle="""
SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
""",
    description="Correlated subquery (each customer's most expensive "
    "order(s)) — decorrelated to a max-window filter in Spark.",
    tags=("subquery", "window"),
)
def subquery_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey")
    return (
        t(spark, sf_dir, "orders")
        .withColumn("_mx", F.max("o_totalprice").over(w))
        .filter(F.col("o_totalprice") == F.col("_mx"))
        .select(
            "o_custkey", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar function suites
# ---------------------------------------------------------------------------

@register(
    "scalar_string_suite",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       length(p_name) AS name_len,
       substr(p_name, 1, 8) AS name_prefix,
       concat_ws('-', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_snake,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       lpad(p_brand, 12, '*') AS brand_padded,
       reverse(p_brand) AS brand_rev,
       strpos(p_name, 'a') AS first_a,
       (p_name LIKE '%steel%') AS has_steel
FROM part
""",
    description="String scalar suite over part.",
    tags=("scalar",),
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "a").alias("first_a"),
        F.col("p_name").like("%steel%").alias("has_steel"),
    )


@register(
    "scalar_date_suite",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(day(o_orderdate) AS INT) AS order_day,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS plus_30d,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
FROM orders
""",
    description="Date/time scalar suite over orders.",
    tags=("scalar",),
)
def scalar_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        ts_str(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start"),
        ts_str(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus_30d"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
    )


@register(
    "scalar_math_suite",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(CAST(l_extendedprice AS DOUBLE) - 50000) AS abs_dev,
       CAST(ceil(CAST(l_extendedprice AS DOUBLE) / 1000) AS BIGINT) AS price_ceil_k,
       CAST(floor(CAST(l_extendedprice AS DOUBLE) / 1000) AS BIGINT) AS price_floor_k,
       round(sqrt(CAST(l_extendedprice AS DOUBLE)), 4) AS price_sqrt_round,
       sqrt(CAST(l_quantity AS DOUBLE)) AS qty_sqrt,
       CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS qty_sq,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
       CAST(sign(CAST(l_discount AS DOUBLE) - 0.05) AS DOUBLE) AS disc_sign,
       greatest(CAST(l_discount AS DOUBLE), CAST(l_tax AS DOUBLE)) AS max_rate,
       least(CAST(l_discount AS DOUBLE), CAST(l_tax AS DOUBLE)) AS min_rate
FROM lineitem
""",
    description="Math scalar suite (exact/IEEE-deterministic ops only).",
    tags=("scalar",),
)
def scalar_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    qty = F.col("l_quantity").cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 50000).alias("abs_dev"),
        F.ceil(price / 1000).alias("price_ceil_k"),
        F.floor(price / 1000).alias("price_floor_k"),
        F.round(F.sqrt(price), 4).alias("price_sqrt_round"),
        F.sqrt(qty).alias("qty_sqrt"),
        (qty * qty).alias("qty_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(F.col("l_discount").cast("double") - 0.05).alias("disc_sign"),
        F.greatest(F.col("l_discount").cast("double"), F.col("l_tax").cast("double")).alias(
            "max_rate"
        ),
        F.least(F.col("l_discount").cast("double"), F.col("l_tax").cast("double")).alias(
            "min_rate"
        ),
    )


@register(
    "scalar_case_bucketing",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS price_bucket,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders GROUP BY 1
""",
    description="CASE WHEN bucketing + aggregation.",
    tags=("scalar", "agg"),
)
def scalar_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "scalar_json_extract",
    oracle="""
SELECT event_id,
       CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS INT) AS k_value
FROM events
""",
    description="JSON field extraction from the events.props column "
    "(Spark: get_json_object — JVM-side JSON path).",
    tags=("scalar",),
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )
