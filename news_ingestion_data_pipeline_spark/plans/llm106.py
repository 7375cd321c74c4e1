"""Hundred-sixth wave: collation-aware semantics and the TPC-H refresh
cycle.

  * scalar_collation_suite — Spark 4's collation engine exercised for
    real: GROUP BY and JOIN under UTF8_LCASE collation (no lower() on
    the data path — the collation IS the equality), proven against a
    case-fold oracle.  Case-insensitive grouping and joining without
    rewriting every expression is what collations buy a migration from
    a CI-collated warehouse.
  * pipeline_tpch_refresh_cycle — TPC-H's RF1/RF2 refresh functions on
    the snapshot-manifest table: INSERT a batch of new orders, DELETE
    the oldest slice, and verify the surviving aggregate — the
    continuous-refresh loop the benchmark defines but single-shot
    query suites skip.  Runs on the repo's crash-safe manifest engine
    (insert = keyed MERGE, delete = predicate rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm106")


@register(
    "scalar_collation_suite",
    oracle="""
WITH handles AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN upper(source)
              WHEN doc_id % 3 = 1 THEN source
              ELSE upper(substr(source, 1, 1)) || substr(source, 2)
         END AS h
  FROM documents
), dim AS (
  SELECT DISTINCT source AS key_lc, length(source) AS key_len
  FROM documents WHERE CAST(substr(source, 4) AS INT) % 2 = 0
)
SELECT lower(h) AS key,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_case_forms,
       CAST(MAX(d.key_len) AS BIGINT) AS dim_key_len,
       (MAX(d.key_len) IS NOT NULL) AS dim_matched
FROM handles LEFT JOIN dim d ON lower(handles.h) = d.key_lc
GROUP BY lower(h)
ORDER BY key
""",
    description="Collation-aware GROUP BY and JOIN (Spark 4 UTF8_LCASE "
    "— the feature a migration from a case-insensitive-collated "
    "warehouse depends on): handles synthesized in three case forms "
    "per source are grouped under the COLLATION (collate(h, "
    "'UTF8_LCASE') — no lower() on the grouping path) and joined "
    "case-insensitively to a lowercase dimension the same way; the "
    "oracle runs the explicit case-fold equivalent. The output "
    "projects the folded key (a collated group's representative "
    "value is engine-chosen), and n_case_forms proves 3-way case "
    "variants really collapsed. Collation compares inside codegen — "
    "no expression rewrite, no extra pass.",
    tags=("scalar", "join"),
)
def scalar_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    h = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.col("source"))
        .otherwise(
            F.concat(
                F.upper(F.substring("source", 1, 1)),
                F.expr("substr(source, 2)"),
            )
        )
    )
    handles = d.select("doc_id", h.alias("h"))
    dim = (
        d.select("source")
        .distinct()
        .filter(F.substring("source", 4, 10).cast("int") % 2 == 0)
        .select(
            F.col("source").alias("key_lc"),
            F.length("source").alias("key_len"),
        )
    )
    joined = handles.join(
        F.broadcast(dim),
        F.collate(F.col("h"), "UTF8_LCASE")
        == F.collate(F.col("key_lc"), "UTF8_LCASE"),
        "left",
    )
    return (
        joined.groupBy(F.collate(F.col("h"), "UTF8_LCASE").alias("hk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(F.collate(F.col("h"), "UTF8_BINARY"))
            .cast("bigint")
            .alias("n_case_forms"),
            F.max("key_len").cast("bigint").alias("dim_key_len"),
            F.max("key_len").isNotNull().alias("dim_matched"),
        )
        .select(
            F.lower(F.collate(F.col("hk"), "UTF8_BINARY")).alias("key"),
            "n_docs",
            "n_case_forms",
            "dim_key_len",
            "dim_matched",
        )
        
    )


@register(
    "pipeline_tpch_refresh_cycle",
    oracle="""
WITH rf1 AS (
  SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM orders) + 1 AS k,
         o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 10 = 1
), base AS (
  SELECT o_orderkey AS k, o_orderpriority, o_totalprice FROM orders
  UNION ALL SELECT k, o_orderpriority, o_totalprice FROM rf1
), cutoff AS (
  SELECT (SELECT MAX(o_orderkey) FROM orders) // 20 AS c
), survived AS (
  SELECT * FROM base WHERE k > (SELECT c FROM cutoff)
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
            AS DOUBLE) AS total_revenue,
       CAST((SELECT COUNT(*) FROM rf1) AS BIGINT) AS n_inserted,
       CAST((SELECT COUNT(*) FROM base WHERE k <= (SELECT c FROM cutoff))
            AS BIGINT) AS n_deleted
FROM survived
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="TPC-H refresh cycle (RF1 insert + RF2 delete) on the "
    "crash-safe manifest table: seed the snapshot table from orders, "
    "MERGE a 10% batch of brand-new order keys (RF1), DELETE the "
    "oldest 5% of the keyspace (RF2, predicate rewrite), then verify "
    "the surviving per-priority aggregate with decimal-exact revenue "
    "plus pinned inserted/deleted counts — the continuous-refresh "
    "loop the benchmark defines but single-shot query suites skip. "
    "At 100 TB RF1 is an incremental keyed MERGE (broadcast update "
    "keys) and RF2 a partition-pruned rewrite — both already proven "
    "primitives, here composed and re-verified end to end.",
    tags=("pipeline", "storage", "upsert"),
)
def pipeline_tpch_refresh_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    path = f"{_ROOT}/rf_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    UP.drop_table(path)
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("Article_id"),
        "o_orderpriority",
        "o_totalprice",
    )
    mx = o.agg(F.max("Article_id")).collect()[0][0]
    UP.upsert_articles(spark, path, o)
    rf1 = o.filter(F.col("Article_id") % 10 == 1).withColumn(
        "Article_id", F.col("Article_id") + F.lit(mx) + 1
    )
    n_inserted = rf1.count()
    UP.upsert_articles(spark, path, rf1)
    cutoff = mx // 20
    before = UP.read_articles(spark, path).count()
    UP.delete_where(spark, path, F.col("Article_id") <= cutoff)
    cur = UP.read_articles(spark, path)
    n_deleted = before - cur.count()
    return (
        cur.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_revenue"),
        )
        .withColumn("n_inserted", F.lit(n_inserted).cast("bigint"))
        .withColumn("n_deleted", F.lit(n_deleted).cast("bigint"))
        
    )
