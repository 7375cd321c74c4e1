"""Twenty-first wave: the skyline (Pareto-dominance) operator via the
sort + running-min rewrite, and snapshot-diff reconciliation over the
manifest table's version history — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "part_skyline_2d",
    oracle="""
WITH ranked AS (
  SELECT p_partkey, p_size, p_retailprice,
         MIN(p_retailprice) OVER (ORDER BY p_size, p_retailprice, p_partkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS best_price_smaller
  FROM part
)
SELECT p_partkey, p_size, p_retailprice
FROM ranked
WHERE best_price_smaller IS NULL OR p_retailprice < best_price_smaller
ORDER BY p_size, p_retailprice, p_partkey
""",
    description="Skyline / Pareto frontier (Borzsonyi et al., ICDE 2001) "
    "over (size, price) minimization — 'no other part is both smaller "
    "AND cheaper': the multi-criteria shortlist operator product search "
    "runs. The naive formulation is an O(n^2) NOT EXISTS dominance "
    "anti-join; the 2-D rewrite here is one SORT + one running-min "
    "window — a part survives iff its price beats every strictly-"
    "preceding part's best price in (size, price, key) order, which for "
    "ties-included dominance (<=, <=, one strict) reduces to comparing "
    "against the prefix minimum EXCLUDING the current row (exact (size, price) duplicates resolve to the first in key order — the distinct-value skyline convention, mirrored in the oracle). O(n log n), "
    "decomposed for scale: the prefix min splits into the broadcast "
    "per-size minimum of all strictly-smaller sizes (≤50-row bounded "
    "domain) plus an in-size running min PARTITIONED by p_size — no "
    "single-partition window at any SF. "
    "Output is integer/2-dp-exact, no epsilon surface.",
    tags=("agg", "skyline", "part"),
)
def part_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-level running min, never a single-partition window: the prefix
    # min over (size, price, key) order splits into (a) the min price of
    # all strictly-SMALLER sizes — a per-size hash aggregate (≤50 rows,
    # the bounded p_size domain) plus one histogram-scale cumulative
    # window — and (b) the in-size running min, a window PARTITIONED by
    # p_size. greatest/least null semantics match the empty-prefix NULL.
    part = t(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    per_size = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("__size_min")
    )
    w_sizes = Window.orderBy("p_size").rowsBetween(
        Window.unboundedPreceding, -1
    )
    below = per_size.select(
        "p_size", F.min("__size_min").over(w_sizes).alias("best_below")
    )
    w_in = (
        Window.partitionBy("p_size")
        .orderBy("p_retailprice", "p_partkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = part.join(F.broadcast(below), "p_size").select(
        "p_partkey",
        "p_size",
        "p_retailprice",
        F.least(
            F.col("best_below"), F.min("p_retailprice").over(w_in)
        ).alias("__bps"),
    )
    return (
        ranked.filter(
            F.col("__bps").isNull()
            | (F.col("p_retailprice") < F.col("__bps"))
        )
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy("p_size", "p_retailprice", "p_partkey")
    )


@register(
    "pipeline_snapshot_diff",
    oracle="""
WITH v1 AS (
  SELECT doc_id, md5(text) AS content_key FROM documents
  WHERE doc_id % 3 != 0
), v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN md5(text || '!') ELSE md5(text) END
           AS content_key
  FROM documents
  WHERE doc_id % 3 != 0 AND doc_id % 7 != 0
  UNION ALL
  SELECT doc_id, md5(text) AS content_key FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 2 = 0
), classified AS (
  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         CASE WHEN v1.doc_id IS NULL THEN 'added'
              WHEN v2.doc_id IS NULL THEN 'removed'
              WHEN v1.content_key != v2.content_key THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT change_type, COUNT(*) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM classified GROUP BY change_type
ORDER BY change_type
""",
    description="Snapshot diff — the reconciliation report a pipeline "
    "publishes with every table version ('what changed since "
    "yesterday'): two versions of the table (v2 mutates a deterministic "
    "slice, deletes another, inserts a third) FULL-OUTER join on the "
    "key and classify each row added / removed / changed / unchanged "
    "by key presence and content-hash inequality. At 100 TB the "
    "content_key comparison is why tables carry a row-hash column: the "
    "diff never compares payloads, only 32-byte keys, and "
    "partition-aligned versions diff partition-locally. Integer-exact "
    "fingerprints per class; the oracle reconstructs both versions "
    "relationally.",
    tags=("pipeline", "quality", "upsert"),
)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", F.md5("text").alias("content_key")
    )
    v2_kept = docs.filter(
        (F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 7 != 0)
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.md5(F.concat(F.col("text"), F.lit("!")))
        )
        .otherwise(F.md5("text"))
        .alias("content_key"),
    )
    v2_added = docs.filter(
        (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 0)
    ).select("doc_id", F.md5("text").alias("content_key"))
    v2 = v2_kept.unionByName(v2_added)
    j = v1.alias("v1").join(
        v2.alias("v2"), F.col("v1.doc_id") == F.col("v2.doc_id"), "full_outer"
    )
    change = (
        F.when(F.col("v1.doc_id").isNull(), "added")
        .when(F.col("v2.doc_id").isNull(), "removed")
        .when(F.col("v1.content_key") != F.col("v2.content_key"), "changed")
        .otherwise("unchanged")
    )
    classified = j.select(
        F.coalesce(F.col("v1.doc_id"), F.col("v2.doc_id")).alias("doc_id"),
        change.alias("change_type"),
    )
    return (
        classified.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").alias("sum_ids"),
        )
        
    )
