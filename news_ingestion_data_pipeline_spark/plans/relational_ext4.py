"""Fourth relational wave: exact multi-percentiles, deterministic nested
collection, and map-type scalar plumbing — analytics shapes the earlier
waves didn't cover, each with a bit-exact DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "agg_percentile_ranks",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM lineitem
)
SELECT l_returnflag,
       MAX(CASE WHEN rn = CAST(ceil(0.50 * cnt) AS BIGINT)
                THEN l_extendedprice END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(0.90 * cnt) AS BIGINT)
                THEN l_extendedprice END) AS p90,
       MAX(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT)
                THEN l_extendedprice END) AS p99,
       MAX(cnt) AS n_rows
FROM ranked
GROUP BY l_returnflag
""",
    description="Exact p50/p90/p99 per group via nearest-rank selection "
    "(row_number + partition count), pivoted to columns in one conditional "
    "aggregate — native percentile primitives interpolate differently per "
    "engine, nearest-rank is engine-portable. Equal values at the cut rank "
    "make the row_number tie order irrelevant to the selected value. One "
    "shuffle on the group key serves the window and the aggregate.",
    tags=("agg", "window", "stats"),
)
def agg_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wc = Window.partitionBy("l_returnflag")
    ranked = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )

    def at(p: float):
        cut = F.ceil(F.lit(p) * F.col("cnt")).cast("bigint")
        return F.max(F.when(F.col("rn") == cut, F.col("l_extendedprice")))

    return ranked.groupBy("l_returnflag").agg(
        at(0.50).alias("p50"),
        at(0.90).alias("p90"),
        at(0.99).alias("p99"),
        F.max("cnt").alias("n_rows"),
    )


@register(
    "agg_collect_sorted_lines",
    oracle="""
SELECT l_orderkey AS o_orderkey,
       array_to_string(
         list_sort(list(l_linenumber || ':'
                        || CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR))),
         ',') AS line_qtys,
       CAST(COUNT(*) AS INT) AS n_lines
FROM lineitem
WHERE l_orderkey % 997 = 0
GROUP BY l_orderkey
""",
    description="Nested-type collection with deterministic order: per-order "
    "line list assembled with collect_list + array_sort, serialized to one "
    "string. collect_list alone is partition-order-dependent — sorting the "
    "built array (sort key = the zero-padded linenumber prefix) restores "
    "determinism without a second shuffle. The modulo filter keeps the "
    "collected groups bounded (collect on an unfiltered 100 TB fact table "
    "would be a per-key memory bomb).",
    tags=("agg", "nested"),
)
def agg_collect_sorted_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 997 == 0)
    # The fixture allows duplicate linenumbers per order, so the sort must
    # be over the full serialized entry (a total lexical order both engines
    # share), not the linenumber alone.
    entry = F.concat_ws(
        ":",
        F.col("l_linenumber").cast("string"),
        F.col("l_quantity").cast("decimal(18,2)").cast("string"),
    )
    return (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.array_sort(F.collect_list(entry)).alias("entries"),
            F.count(F.lit(1)).cast("int").alias("n_lines"),
        )
        .select(
            "o_orderkey",
            F.concat_ws(",", "entries").alias("line_qtys"),
            "n_lines",
        )
    )


@register(
    "scalar_map_suite",
    oracle="""
SELECT o_orderkey,
       o_orderpriority,
       CASE split_part(o_orderpriority, '-', 1)
         WHEN '1' THEN 100 WHEN '2' THEN 80 WHEN '3' THEN 50
         WHEN '4' THEN 20 ELSE 10 END AS priority_weight,
       CASE WHEN split_part(o_orderpriority, '-', 1) IN ('1','2','3','4')
            THEN TRUE ELSE FALSE END AS known_priority
FROM orders
WHERE o_orderkey % 101 = 0
""",
    description="Map-type scalar plumbing: a literal map<string,int> built "
    "with map_from_arrays, probed per row with element_at + coalesce "
    "default and contains-key. The map literal is a Catalyst constant — "
    "the lookup compiles into the project stage, equivalent to a CASE "
    "ladder (the oracle's form) but declared as data, not control flow.",
    tags=("scalar", "map"),
)
def scalar_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    weights = F.map_from_arrays(
        F.array(*[F.lit(k) for k in ("1", "2", "3", "4")]),
        F.array(*[F.lit(v) for v in (100, 80, 50, 20)]),
    )
    key = F.split(F.col("o_orderpriority"), "-")[0]
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.coalesce(F.element_at(weights, key), F.lit(10)).alias(
                "priority_weight"
            ),
            F.array_contains(F.map_keys(weights), key).alias("known_priority"),
        )
    )
