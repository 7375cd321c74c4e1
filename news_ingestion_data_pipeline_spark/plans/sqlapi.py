"""SQL front-end surface: queries submitted as SQL *text* via ``spark.sql``
over registered temp views (tables.register_views), not the DataFrame API.

The same engine-portable ANSI string is used verbatim as the DuckDB oracle —
parity of the SQL front-end is proven by construction: one query text, two
engines, hash-equal answers. Catalyst plans these identically to their
DataFrame twins (same analyzed plan), so every optimization note elsewhere
(broadcast dims, partial aggs, decimal determinism) applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from news_ingestion_data_pipeline_spark.plans.registry import register
from news_ingestion_data_pipeline_spark.tables import register_views

_SQL_REGION_REVENUE = """
SELECT r_name, n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
GROUP BY r_name, n_name
"""

_SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE o_orderstatus <> 'F'
) ranked
WHERE rn <= 3
"""


@register(
    "sql_frontend_region_revenue",
    oracle=_SQL_REGION_REVENUE,
    description="SQL front-end proof: this exact ANSI text runs through "
    "spark.sql over registered views AND as the DuckDB oracle — one string, "
    "two engines. 4-way star join (orders→customer→nation→region) with "
    "exact-decimal revenue; Catalyst broadcasts the three dims.",
    tags=("sql", "join", "agg"),
)
def sql_frontend_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_REGION_REVENUE)


@register(
    "sql_frontend_top_orders",
    oracle=_SQL_TOP_ORDERS_PER_CUSTOMER,
    description="SQL front-end window functions: per-customer top-3 orders "
    "by price via ROW_NUMBER, same literal text on both engines. One "
    "shuffle on the window partition key; rn<=3 prunes before projection.",
    tags=("sql", "window"),
)
def sql_frontend_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_TOP_ORDERS_PER_CUSTOMER)
