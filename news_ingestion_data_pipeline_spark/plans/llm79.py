"""Seventy-ninth wave: positional phrase search and fulfillment latency.

text_phrase_search_positional answers phrase queries the way search
engines do — a positional inverted index joined on matching position
offsets — rather than by materializing every n-gram (dedup_common_spans'
trick, which explodes storage at query time).
orders_fulfillment_latency is the order-to-ship SLA distribution per
priority class — the operations metric the o_orderpriority column
exists to drive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_PH_TERMS = ["hash", "join"]  # the phrase, in order


@register(
    "text_phrase_search_positional",
    oracle=f"""
WITH pos AS (
  SELECT doc_id, u.i AS p, tk[u.i] AS w
  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS tk
        FROM documents WHERE length(trim(text)) > 0),
       LATERAL (SELECT UNNEST(range(1, len(tk) + 1)) AS i) u
  WHERE tk[u.i] IN ({", ".join(f"'{w}'" for w in _PH_TERMS)})
), hits AS (
  SELECT t0.doc_id, t0.p AS phrase_pos
  FROM (SELECT doc_id, p FROM pos WHERE w = '{_PH_TERMS[0]}') t0
  JOIN (SELECT doc_id, p FROM pos WHERE w = '{_PH_TERMS[1]}') t1
    ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(phrase_pos) AS BIGINT) AS first_pos
FROM hits
GROUP BY doc_id
ORDER BY doc_id
""",
    description=f"Positional phrase search for the exact phrase "
    f"{' '.join(_PH_TERMS)!r}: a positional inverted index (term, doc, "
    "position) filtered to the query terms, then consecutive-position "
    "equi-joins (t1.pos = t0.pos + 1) assemble phrase occurrences — "
    "the way search engines answer phrase queries without storing "
    "every n-gram (dedup_common_spans materializes grams because its "
    "workload is ALL-pairs; a per-query phrase lookup would waste "
    "that storage). Posting lists filter to query terms BEFORE any "
    "join, so cost is the postings of two terms, not the corpus; at "
    "100 TB the index is the materialized table and this query is "
    "partition-local lookups on term. Output: per matching document "
    "the occurrence count and first position — exact integers.",
    tags=("text", "llm", "retrieval"),
)
def text_phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.trim(F.lower("text")), " ")
    pos = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.posexplode(toks).alias("p0", "w"))
        .filter(F.col("w").isin(_PH_TERMS))
        .select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    )
    t0 = pos.filter(F.col("w") == _PH_TERMS[0]).select(
        "doc_id", F.col("p").alias("p0_")
    )
    t1 = pos.filter(F.col("w") == _PH_TERMS[1]).select(
        F.col("doc_id").alias("d1"), F.col("p").alias("p1_")
    )
    hits = t0.join(
        t1,
        (F.col("doc_id") == F.col("d1")) & (F.col("p1_") == F.col("p0_") + 1),
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("p0_").cast("bigint").alias("first_pos"),
        )
        
    )


@register(
    "orders_fulfillment_latency",
    oracle="""
WITH per_order AS (
  SELECT l.l_orderkey, o.o_orderpriority,
         CAST(MIN(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
              AS BIGINT) AS first_ship_days,
         CAST(MAX(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
              AS BIGINT) AS last_ship_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY l.l_orderkey, o.o_orderpriority
), ranked AS (
  SELECT o_orderpriority, first_ship_days, last_ship_days,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY first_ship_days, l_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM per_order
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN first_ship_days END) AS BIGINT)
         AS median_first_ship_days,
       CAST(MIN(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT)
                     THEN first_ship_days END) AS BIGINT)
         AS p95_first_ship_days,
       round(CAST(SUM(last_ship_days - first_ship_days) AS DOUBLE) / MAX(n), 6)
         AS mean_ship_span_days,
       round(CAST(COUNT(*) FILTER (WHERE first_ship_days <= 30) AS DOUBLE)
             / MAX(n), 6) AS frac_shipped_30d
FROM ranked
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Order-to-ship fulfillment latency per priority class: "
    "each order's first and last lineitem ship lag (exact integer "
    "days), summarized as the exact median and p95 first-ship lag, "
    "the mean first-to-last span (split-shipment size), and the "
    "30-day SLA attainment — the operations readout o_orderpriority "
    "exists to drive, and the check that 1-URGENT actually ships "
    "faster than 5-LOW. Per-priority percentile ranks run over the "
    "ORDER domain (one aggregate below lineitem) partitioned by the "
    "5 priority classes. Shape: one fact-dim join (orders side "
    "broadcastable per key), one per-order aggregate, one partitioned "
    "rank.",
    tags=("orders", "lineitem", "agg", "stats"),
)
def orders_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    per_order = (
        t(spark, sf_dir, "lineitem")
        .join(
            t(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.floor(
                F.min(us("l_shipdate") - us("o_orderdate")) / 86_400_000_000
            )
            .cast("bigint")
            .alias("first_ship_days"),
            F.floor(
                F.max(us("l_shipdate") - us("o_orderdate")) / 86_400_000_000
            )
            .cast("bigint")
            .alias("last_ship_days"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "first_ship_days", "l_orderkey"
    )
    ranked = per_order.select(
        "o_orderpriority",
        "first_ship_days",
        "last_ship_days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("bigint").alias("n_orders"),
            F.min(
                F.when(
                    F.col("rn") == F.floor((F.col("n") + 1) / 2),
                    F.col("first_ship_days"),
                )
            )
            .cast("bigint")
            .alias("median_first_ship_days"),
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * 0.95).cast("bigint"),
                    F.col("first_ship_days"),
                )
            )
            .cast("bigint")
            .alias("p95_first_ship_days"),
            F.round(
                F.sum(F.col("last_ship_days") - F.col("first_ship_days")).cast(
                    "double"
                )
                / F.max("n"),
                6,
            ).alias("mean_ship_span_days"),
            F.round(
                F.count(F.when(F.col("first_ship_days") <= 30, 1)).cast("double")
                / F.max("n"),
                6,
            ).alias("frac_shipped_30d"),
        )
        
    )
