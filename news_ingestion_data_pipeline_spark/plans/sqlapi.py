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
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS total_revenue,
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


_SQL_LATERAL_TOPN = """
SELECT n_name, t.c_custkey, t.acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c_custkey
  LIMIT 2
) t
"""


@register(
    "sql_lateral_topn",
    oracle=_SQL_LATERAL_TOPN,
    description="LATERAL correlated subquery with ORDER BY + LIMIT (top-2 "
    "customers per nation): the SQL-standard per-row-subquery shape "
    "Catalyst decorrelates into a join + per-group limit rather than "
    "executing N subqueries — the rewrite that makes lateral usable at "
    "scale. Same literal text on both engines (sqlapi pattern: parity by "
    "construction); total (acctbal DESC, custkey) order makes the top-2 "
    "deterministic.",
    tags=("sql", "subquery", "lateral"),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL_TOPN)


_SQL_RECURSIVE_CALENDAR = """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months WHERE m < DATE '2001-08-01'
), o AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, o_totalprice FROM orders
)
SELECT months.m AS month, COUNT(o.m) AS n_orders,
       CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS revenue
FROM months LEFT JOIN o ON o.m = months.m
GROUP BY months.m
"""


@register(
    "sql_recursive_calendar",
    oracle=_SQL_RECURSIVE_CALENDAR,
    description="Recursive CTE (WITH RECURSIVE, Spark 4) generating a "
    "monthly calendar spine, left-joined to orders so ZERO-order months "
    "surface as rows — the gaps a plain GROUP BY over facts silently "
    "drops, and the canonical recursive-SQL use in reporting. The spine "
    "is 80 rows regardless of fact volume, so the recursion is "
    "driver-trivial while the probe side stays a normal distributed "
    "aggregate. Same literal text runs on both engines.",
    tags=("sql", "recursive", "agg"),
)
def sql_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_RECURSIVE_CALENDAR)


# Variant (semi-structured) surface: the Spark query parses JSON into the
# VARIANT type and extracts typed paths (shredding-friendly binary format
# — the 100 TB semi-structured story); the oracle mirrors the same paths
# with DuckDB's JSON functions over the identical generated document, so
# the text differs but the arithmetic is term-for-term equal.
_SQL_VARIANT_SPARK = """
SELECT o_orderkey,
       variant_get(v, '$.pri', 'string')  AS pri,
       variant_get(v, '$.tags[0]', 'int') AS tag0,
       variant_get(v, '$.tags[1]', 'int') AS tag1,
       variant_get(v, '$.k', 'bigint') + variant_get(v, '$.tags[0]', 'bigint') AS ksum
FROM (
  SELECT o_orderkey,
         parse_json('{"k":' || o_orderkey || ',"pri":"' || o_orderpriority
                    || '","tags":[' || (o_orderkey % 7) || ','
                    || (o_orderkey % 11) || ']}') AS v
  FROM orders
)
"""

_SQL_VARIANT_DUCK = """
SELECT o_orderkey,
       json_extract_string(v, '$.pri') AS pri,
       CAST(json_extract(v, '$.tags[0]') AS INT) AS tag0,
       CAST(json_extract(v, '$.tags[1]') AS INT) AS tag1,
       CAST(json_extract(v, '$.k') AS BIGINT)
         + CAST(json_extract(v, '$.tags[0]') AS BIGINT) AS ksum
FROM (
  SELECT o_orderkey,
         '{"k":' || o_orderkey || ',"pri":"' || o_orderpriority
         || '","tags":[' || (o_orderkey % 7) || ',' || (o_orderkey % 11) || ']}' AS v
  FROM orders
)
"""


@register(
    "sql_variant_extract",
    oracle=_SQL_VARIANT_DUCK,
    description="VARIANT semi-structured extraction: parse_json into "
    "Spark 4's binary variant type, then typed path extraction "
    "(variant_get with string/int/bigint targets) including array "
    "indexing and cross-path arithmetic. Variant's binary encoding is "
    "what makes schemaless columns scan-efficient at 100 TB (no "
    "per-row JSON re-parse after ingest; shredding pushes paths into "
    "columnar storage). Oracle mirrors the identical generated document "
    "through DuckDB's JSON functions.",
    tags=("sql", "variant", "semistructured"),
)
def sql_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_VARIANT_SPARK)


# XML surface: the Spark query serializes each order to an XML fragment
# (identical string concat in both engines would be possible, but only
# Spark parses it back — from_xml with a declared schema, nested element
# + typed fields). The oracle selects the same fields straight from the
# base table: a hash match proves the serialize→parse cycle lossless.
_SQL_XML_SPARK = """
SELECT o_orderkey,
       x.pri   AS pri,
       x.cust  AS cust,
       CAST(x.total AS DOUBLE) AS total
FROM (
  SELECT o_orderkey,
         from_xml(
           '<order key="' || o_orderkey || '"><pri>' || o_orderpriority
           || '</pri><cust>' || o_custkey || '</cust><total>'
           || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING)
           || '</total></order>',
           'pri STRING, cust BIGINT, total DECIMAL(18,2)') AS x
  FROM orders
)
"""

_SQL_XML_DUCK = """
SELECT o_orderkey,
       o_orderpriority AS pri,
       o_custkey AS cust,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
FROM orders
"""


@register(
    "sql_xml_roundtrip",
    oracle=_SQL_XML_DUCK,
    description="XML ingestion surface (Spark 4 from_xml): each order is "
    "serialized to an XML fragment and parsed back with a DECLARED "
    "schema (typed string/bigint/decimal fields from nested elements — "
    "no inference pass). The oracle reads the same fields directly from "
    "the base table, so the hash match proves the serialize->parse "
    "round trip lossless, the check that matters when a pipeline must "
    "ingest legacy XML feeds (the news/RSS world the reference scrapes "
    "is full of them) next to parquet.",
    tags=("sql", "xml", "scan"),
)
def sql_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_XML_SPARK)
