"""Hundred-thirty-second wave: trending-term detection and additivity
reconciliation.

  * text_trending_terms — the news-pipeline staple the reference's
    users would reach for next: split the corpus into a baseline and a
    recent half, score every term's lift ((recent_rate + s) /
    (baseline_rate + s), Laplace-smoothed) and keep the top risers.
    All rates are exact integer-count ratios snapped through decimals,
    with a minimum-support floor so one-off typos can't trend.
  * pipeline_totals_reconciliation — the BI additivity audit: daily
    revenue must roll up to monthly, monthly to yearly, yearly to the
    grand total — EXACTLY, because every level sums the same decimal
    column.  Emits one row per level with the reconciliation delta
    (zero, by construction, and hash-proven zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions.text import normalize_text, tokens
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_MIN_SUP = 5
_TOPK = 20

_SQL_TOKS_NORM = (
    f"list_filter(regexp_split_to_array({SQL_NORM.format(col='text')}, "
    "'\\s+'), _t -> _t <> '')"
)


@register(
    "text_trending_terms",
    oracle=f"""
WITH tk AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 1 THEN 'recent' ELSE 'baseline' END AS half,
         unnest({_SQL_TOKS_NORM}) AS term
  FROM documents
),
counts AS (
  SELECT term,
         SUM(CASE WHEN half = 'recent' THEN 1 ELSE 0 END) AS c_recent,
         SUM(CASE WHEN half = 'baseline' THEN 1 ELSE 0 END) AS c_base
  FROM tk GROUP BY term
),
tot AS (
  SELECT SUM(c_recent) AS n_recent, SUM(c_base) AS n_base FROM counts
),
scored AS (
  SELECT c.term,
         CAST(c.c_recent AS BIGINT) AS c_recent,
         CAST(c.c_base AS BIGINT) AS c_base,
         CAST(round(
           ((c.c_recent + 1.0) / (t.n_recent + 1.0))
           / ((c.c_base + 1.0) / (t.n_base + 1.0)), 9)
           AS DECIMAL(18,9)) AS lift9
  FROM counts c CROSS JOIN tot t
  WHERE c.c_recent + c.c_base >= {_MIN_SUP}
)
SELECT term, c_recent, c_base,
       CAST(CAST(lift9 AS VARCHAR) AS DOUBLE) AS lift
FROM scored
ORDER BY lift9 DESC, term
LIMIT {_TOPK}
""",
    description="Trending-term detection — the newsroom 'what is rising "
    "RIGHT NOW' query: corpus split into baseline/recent halves (odd "
    "doc_ids stand in for the recent window on this timestamp-less "
    "corpus), per-term Laplace-smoothed rate lift between halves, "
    f"minimum support {_MIN_SUP} so hapaxes can't trend, total "
    f"(lift, term) order, top {_TOPK}. The lift is one deterministic "
    "IEEE expression per term snapped to a 9-dp decimal for the total "
    "order. Scale shape: one token explode + one term-count aggregate — "
    "the same shuffle text_tfidf_top_terms pays; the scored table is "
    "vocabulary-sized.",
    tags=("text", "agg"),
)
def text_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    tk = t(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 2 == 1, "recent")
        .otherwise("baseline")
        .alias("half"),
        F.explode(tokens(normalize_text(F.col("text")))).alias("term"),
    )
    counts = tk.groupBy("term").agg(
        F.sum(F.when(F.col("half") == "recent", 1).otherwise(0)).alias(
            "c_recent"
        ),
        F.sum(F.when(F.col("half") == "baseline", 1).otherwise(0)).alias(
            "c_base"
        ),
    )
    tot = counts.agg(
        F.sum("c_recent").alias("n_recent"), F.sum("c_base").alias("n_base")
    )
    scored = (
        counts.filter(F.col("c_recent") + F.col("c_base") >= _MIN_SUP)
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.col("c_recent").cast("bigint").alias("c_recent"),
            F.col("c_base").cast("bigint").alias("c_base"),
            F.round(
                ((F.col("c_recent") + 1.0) / (F.col("n_recent") + 1.0))
                / ((F.col("c_base") + 1.0) / (F.col("n_base") + 1.0)),
                9,
            )
            .cast("decimal(18,9)")
            .alias("lift9"),
        )
    )
    return (
        scored.orderBy(F.desc("lift9"), "term")
        .limit(_TOPK)
        .select(
            "term",
            "c_recent",
            "c_base",
            F.col("lift9").cast("double").alias("lift"),
        )
    )


@register(
    "pipeline_totals_reconciliation",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
monthly AS (
  SELECT date_trunc('month', d) AS m, SUM(rev) AS rev
  FROM daily GROUP BY 1
),
yearly AS (
  SELECT date_trunc('year', m) AS y, SUM(rev) AS rev
  FROM monthly GROUP BY 1
),
grand AS (
  SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM orders
),
levels AS (
  SELECT 'daily' AS level, COUNT(*) AS n_buckets, SUM(rev) AS total
  FROM daily
  UNION ALL
  SELECT 'monthly', COUNT(*), SUM(rev) FROM monthly
  UNION ALL
  SELECT 'yearly', COUNT(*), SUM(rev) FROM yearly
)
SELECT l.level,
       CAST(l.n_buckets AS BIGINT) AS n_buckets,
       CAST(CAST(l.total AS VARCHAR) AS DOUBLE) AS total_revenue,
       CAST(CAST(l.total - g.rev AS VARCHAR) AS DOUBLE) AS delta_vs_grand
FROM levels l CROSS JOIN grand g
ORDER BY level
""",
    description="Additivity reconciliation — the audit every BI stack "
    "runs nightly: daily revenue rolled to monthly, monthly to yearly, "
    "each level's total compared against the grand total computed "
    "directly from the facts. Because every level sums the SAME exact "
    "decimal column, the deltas are zero by construction and the hash "
    "PROVES them zero — a float pipeline would show cents-level drift "
    "between levels (re-summing doubles in different orders), which is "
    "precisely the bug this audit exists to catch. One fact scan; the "
    "rollups cascade over bucket-sized intermediates.",
    tags=("pipeline", "agg", "quality"),
)
def pipeline_totals_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(F.sum(dec).alias("rev"))
    monthly = daily.groupBy(
        F.date_trunc("month", "d").alias("m")
    ).agg(F.sum("rev").alias("rev"))
    yearly = monthly.groupBy(
        F.date_trunc("year", "m").alias("y")
    ).agg(F.sum("rev").alias("rev"))
    grand = orders.agg(F.sum(dec).alias("grev"))

    def level(df, name):
        return df.agg(
            F.lit(name).alias("level"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("rev").alias("total"),
        )

    levels = (
        level(daily, "daily")
        .unionByName(level(monthly, "monthly"))
        .unionByName(level(yearly, "yearly"))
    )
    return (
        levels.crossJoin(F.broadcast(grand))
        .select(
            "level",
            F.col("n_buckets").cast("bigint").alias("n_buckets"),
            F.col("total").cast("double").alias("total_revenue"),
            (F.col("total") - F.col("grev")).cast("double").alias(
                "delta_vs_grand"
            ),
        )
        
    )
