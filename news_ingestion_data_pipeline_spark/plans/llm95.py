"""Ninety-fifth wave: corpus domain balancing and bitemporal as-of.

  * domain-share capping — the CommonCrawl-style curation stage that
    keeps any single site from dominating a training mix: rank each
    source's documents by quality (n_chars DESC, doc_id tiebreak) and
    keep at most cap = ceil(2% of corpus) per source.  The report shows
    per-source kept/dropped and the cap that applied.
  * bitemporal as-of — the two-axis temporal query a warehouse needs
    once facts get CORRECTED after the fact: each order carries
    versions along transaction time (corrections arriving on later
    days) while valid time (the order date) never moves; the query
    reconstructs "what did we believe on 1995-06-15" — latest version
    whose transaction date had arrived, for orders whose valid date
    existed at all.  SCD2 (`pipeline_scd2_intervals`) and the
    point-in-time join (`feature_point_in_time_join`) each cover ONE
    axis; this covers both at once.

Both are window-rank / max-per-key shapes: one shuffle on the
source / order key, map-side combinable aggregates after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "curation_domain_cap",
    oracle="""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn,
         CAST(ceil(0.02 * (SELECT COUNT(*) FROM documents)) AS BIGINT)
           AS cap
  FROM documents
)
SELECT source,
       CAST(MAX(cap) AS BIGINT) AS cap,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rn <= cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > cap THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN rn <= cap THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars
FROM ranked
GROUP BY source
ORDER BY source
""",
    description="Domain-share capping — the curation stage that stops "
    "one site from dominating a training mix: rank every source's "
    "documents by quality proxy (n_chars DESC, doc_id tiebreak) and "
    "keep at most cap = ceil(2% of corpus) per source, reporting "
    "kept/dropped counts and retained chars per source. One window "
    "rank partitioned by source + one hash aggregate; the corpus count "
    "is a broadcast scalar. A skewed mega-domain at 100 TB uses the "
    "two-pass bucket-rank decomposition in operators/ranking.py for "
    "its within-source rank — the cap rule itself never changes.",
    tags=("curation", "llm", "sampling"),
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    total = d.count()
    cap = -(-total * 2 // 100)  # ceil(0.02 * total) in exact int math
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("n_chars").desc(), F.col("doc_id")
        )
    )
    ranked = d.withColumn("rn", rn)
    kept = F.col("rn") <= cap
    return (
        ranked.groupBy("source")
        .agg(
            F.lit(cap).cast("bigint").alias("cap"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(kept.cast("bigint")).cast("bigint").alias("n_kept"),
            F.sum((~kept).cast("bigint")).cast("bigint").alias("n_dropped"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
        
    )


@register(
    "pipeline_bitemporal_asof",
    oracle="""
WITH versions AS (
  SELECT o_orderkey, o_orderpriority, o_orderdate, o_totalprice,
         unnest(range(0, (o_orderkey % 3) + 1)) AS k
  FROM orders
), priced AS (
  SELECT o_orderkey, o_orderpriority,
         o_orderdate + INTERVAL (k) DAY AS tx_date,
         CAST(o_totalprice AS DECIMAL(18,2)) + k AS price_v,
         k
  FROM versions
), believed AS (
  SELECT o_orderkey, o_orderpriority, price_v,
         ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY k DESC) AS rn
  FROM priced
  WHERE tx_date <= DATE '1995-06-15'
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(price_v) AS VARCHAR) AS DOUBLE) AS believed_revenue
FROM believed
WHERE rn = 1
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Bitemporal as-of reconstruction — both temporal axes "
    "at once (SCD2 covers valid time, the point-in-time join covers "
    "one-sided transaction time): every order is corrected on "
    "subsequent transaction days (version k arrives o_orderdate+k "
    "days, adjusting the price; k up to orderkey%3) while its valid "
    "date never moves; the query answers 'what revenue did we BELIEVE "
    "on 1995-06-15' — per order, the latest version whose transaction "
    "date had arrived by then; orders not yet known are absent "
    "entirely. max-version-per-key is a window rank on the order key; "
    "sums run through exact DECIMAL. At 100 TB this is one shuffle on "
    "o_orderkey — the same cost as the SCD2 build, and the audit "
    "query every restated-earnings pipeline must answer.",
    tags=("pipeline", "join", "window"),
)
def pipeline_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    versions = o.withColumn(
        "k", F.explode(F.sequence(F.lit(0), F.col("o_orderkey") % 3))
    )
    priced = versions.select(
        "o_orderkey",
        "o_orderpriority",
        F.date_add(F.col("o_orderdate"), F.col("k").cast("int")).alias(
            "tx_date"
        ),
        (F.col("o_totalprice").cast("decimal(18,2)") + F.col("k")).alias(
            "price_v"
        ),
        "k",
    )
    believed = (
        priced.filter(F.col("tx_date") <= F.lit("1995-06-15").cast("date"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("o_orderkey").orderBy(F.col("k").desc())
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        believed.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price_v").cast("double").alias("believed_revenue"),
        )
        
    )
