"""Hundred-eighth wave: multi-format federation and what-if scenario
grids.

  * scan_multi_format_federation — one logical plan spanning three
    physical formats: the fact table re-landed as headerless CSV, the
    order dimension as JSONL, the customer dimension read from its
    native parquet — joined and aggregated in a single DAG.  Every
    format's scan keeps its own pushdown/pruning; Catalyst doesn't
    care where the rows came from, which is the point: format
    migration never blocks a query.
  * agg_scenario_grid_whatif — the BI what-if pattern: a small
    scenario dimension (price multiplier x discount-threshold grid)
    cross-joined against ALREADY-AGGREGATED base measures, so the
    scenario fan-out multiplies a handful of rows, never the fact
    table.  Decimal-exact projected revenue per scenario.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm108")


@register(
    "scan_multi_format_federation",
    oracle="""
SELECT o.o_orderpriority,
       c.c_mktsegment,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                 AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_orderkey % 3 = 0
GROUP BY o.o_orderpriority, c.c_mktsegment
ORDER BY o_orderpriority, c_mktsegment
""",
    description="Multi-format federated join — one plan over three "
    "physical formats: the lineitem slice re-landed as headerless CSV "
    "(schema-on-read), orders as JSONL, customer from its native "
    "parquet, joined and aggregated in a single DAG with decimal-"
    "exact revenue. Each scan keeps its own format-native pushdown; "
    "the join and aggregate are format-blind — the property that lets "
    "a 100 TB estate migrate formats table-by-table without ever "
    "blocking a query. The oracle runs the same join over the "
    "original parquet, so a format round-trip that lost precision "
    "(CSV numerics!) or rows hash-fails.",
    tags=("scan", "join", "pipeline"),
)
def scan_multi_format_federation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    csv_path = f"{_ROOT}/li_csv_{sfx}"
    json_path = f"{_ROOT}/ord_json_{sfx}"
    for p in (csv_path, json_path):
        shutil.rmtree(p, ignore_errors=True)

    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 3 == 0)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    )
    li.write.option("header", "false").csv(csv_path)
    t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    ).write.json(json_path)

    li_csv = spark.read.schema(
        "l_orderkey long, l_quantity double, l_extendedprice double"
    ).csv(csv_path)
    ord_json = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderpriority string"
    ).json(json_path)
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    return (
        li_csv.join(ord_json, li_csv["l_orderkey"] == ord_json["o_orderkey"])
        .join(cust, ord_json["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderpriority", "c_mktsegment")
        .agg(
            F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
            F.sum("l_quantity").cast("bigint").alias("total_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        
    )


@register(
    "agg_scenario_grid_whatif",
    oracle="""
WITH base AS (
  SELECT o_orderpriority,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
         COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority
), grid AS (
  SELECT m.m AS price_mult_pct, d.d AS demand_drop_pct
  FROM (SELECT unnest([95, 100, 105, 110]) AS m) m
  CROSS JOIN (SELECT unnest([0, 5, 10]) AS d) d
)
SELECT o_orderpriority,
       CAST(price_mult_pct AS INT) AS price_mult_pct,
       CAST(demand_drop_pct AS INT) AS demand_drop_pct,
       CAST(n AS BIGINT) AS n_orders,
       CAST(CAST(CAST(rev * price_mult_pct * (100 - demand_drop_pct)
                      AS DECIMAL(28,2)) AS VARCHAR) AS DOUBLE) / 10000.0
         AS projected_revenue
FROM base CROSS JOIN grid
ORDER BY o_orderpriority, price_mult_pct, demand_drop_pct
""",
    description="What-if scenario grid — the BI planning pattern done "
    "at the right altitude: base measures are aggregated FIRST (one "
    "hash aggregate over orders), then a 12-cell scenario dimension "
    "(price multiplier x demand-drop grid) cross-joins the handful of "
    "aggregate rows — the fan-out multiplies 5 rows by 12, never the "
    "fact table. Projected revenue stays in exact DECIMAL through the "
    "scenario arithmetic with ONE final IEEE division. The adjudicated "
    "cross join is scenario-dim x aggregate — constant-size, broadcast "
    "by construction at any corpus scale.",
    tags=("agg", "join"),
)
def agg_scenario_grid_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # The 12-cell grid is materialized as ONE local relation: nesting a
    # crossJoin of two LocalTableScans inside F.broadcast() would run the
    # inner join on the broadcast-exchange thread and stall until
    # spark.sql.broadcastTimeout (measured: 320 s).  A literal local table
    # broadcasts instantly and is the honest shape for a constant grid.
    grid = local_df(
        spark,
        [(m, d) for m in (95, 100, 105, 110) for d in (0, 5, 10)],
        "price_mult_pct int, demand_drop_pct int",
    )
    projected = (
        (
            F.col("rev")
            * F.col("price_mult_pct")
            * (F.lit(100) - F.col("demand_drop_pct"))
        )
        .cast("decimal(28,2)")
        .cast("double")
        / F.lit(10000.0)
    )
    return (
        base.crossJoin(F.broadcast(grid))
        .select(
            "o_orderpriority",
            "price_mult_pct",
            "demand_drop_pct",
            F.col("n").cast("bigint").alias("n_orders"),
            projected.alias("projected_revenue"),
        )
        
    )
