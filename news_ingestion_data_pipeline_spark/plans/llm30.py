"""Thirtieth wave: marketing attribution and corpus dispersion —
U-shaped (position-based) multi-touch attribution with exact integer
credit arithmetic, and per-term burstiness (variance-to-mean) over
document counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_attribution_ushape",
    oracle="""
WITH conv AS (
  SELECT user_id, MIN(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
), touches AS (
  SELECT e.user_id, e.event_type, e.ts, e.event_id
  FROM events e JOIN conv c ON c.user_id = e.user_id
  WHERE e.event_type IN ('view', 'click', 'signup') AND e.ts < c.conv_ts
), pos AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER w AS rn_asc,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn_desc,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM touches
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), ppm AS (
  SELECT user_id, event_type,
         CASE
           WHEN n = 1 THEN 1000000
           WHEN n = 2 THEN 500000
           WHEN rn_asc = 1 OR rn_desc = 1 THEN 400000
           ELSE (2 * 200000 + (n - 2)) // (2 * (n - 2))
         END AS credit_ppm
  FROM pos
)
SELECT event_type AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       round(CAST(SUM(credit_ppm) AS DOUBLE) / 1000000.0, 6) AS credit
FROM ppm
GROUP BY event_type
ORDER BY channel
""",
    description="U-shaped (position-based) multi-touch attribution: for "
    "each converting user, the touchpoints strictly before their FIRST "
    "purchase get 40% credit to the first touch, 40% to the last, and "
    "the remaining 20% split evenly across the middles (1 touch -> 100%, "
    "2 -> 50/50). Credits are computed as exact integer PARTS-PER-"
    "MILLION with round-half-up integer division — the sum over millions "
    "of users is exact bigint arithmetic, immune to the order-dependent "
    "double accumulation that makes naive attribution sums drift across "
    "partitionings (the ±1ppm per middle touch is part of the operator "
    "contract, like money-in-cents). Position indices come from one "
    "(ts, event_id)-totally-ordered window per user; the rollup is one "
    "hash aggregate on channel. Completes the attribution family next "
    "to events_first_touch.",
    tags=("events", "window", "agg"),
)
def events_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    touches = (
        ev.join(conv, "user_id")
        .where(
            F.col("event_type").isin("view", "click", "signup")
            & (F.col("ts") < F.col("conv_ts"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    wu = Window.partitionBy("user_id")
    pos = touches.select(
        "user_id",
        "event_type",
        F.row_number().over(wu.orderBy("ts", "event_id")).alias("rn_asc"),
        F.row_number()
        .over(wu.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_desc"),
        F.count(F.lit(1)).over(wu).alias("n"),
    )
    credit_ppm = (
        F.when(F.col("n") == 1, 1000000)
        .when(F.col("n") == 2, 500000)
        .when((F.col("rn_asc") == 1) | (F.col("rn_desc") == 1), 400000)
        .otherwise(
            F.expr("(2 * 200000 + (n - 2)) div (2 * (n - 2))")
        )
    )
    return (
        pos.select("user_id", "event_type", credit_ppm.alias("credit_ppm"))
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum("credit_ppm").cast("double") / 1000000.0, 6).alias(
                "credit"
            ),
        )
        
    )


_BURST_TOP = 50


@register(
    "text_term_burstiness",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dc AS (
  SELECT term, doc_id, COUNT(*) AS c FROM toks GROUP BY term, doc_id
), stats AS (
  SELECT term,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS df,
         CAST(SUM(CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS s2
  FROM dc GROUP BY term
)
SELECT term,
       CAST(df AS BIGINT) AS doc_freq,
       CAST(s1 AS BIGINT) AS total_count,
       round(CAST(df * s2 - s1 * s1 AS DOUBLE) / CAST(df * s1 AS DOUBLE), 6)
         AS burstiness
FROM stats
ORDER BY total_count DESC, term
LIMIT {_BURST_TOP}
""",
    description=f"Term burstiness for the top-{_BURST_TOP} corpus terms: "
    "variance-to-mean ratio (index of dispersion) of the term's per-"
    "document count over the documents that contain it — burstiness "
    "near 0 means the term sprinkles uniformly (function words), large "
    "values mean it clumps (topical/boilerplate terms; Church & Gale "
    "1995). Computed from the raw power sums df, Sc, Sc^2 — all integer "
    "DECIMAL, partition-order-proof — as (df*S2 - S1^2)/(df*S1), one "
    "deterministic double division at the end. Shape: explode -> "
    "(term, doc) hash aggregate -> per-term aggregate, all map-side "
    "combinable; the top-K is TakeOrdered. Burstiness is the standard "
    "screen for template/boilerplate contamination that plain document "
    "frequency misses.",
    tags=("text", "stats", "llm"),
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    dc = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    cd = F.col("c").cast("decimal(19,0)")
    stats = dc.groupBy("term").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("df"),
        F.sum(cd).cast("decimal(38,0)").alias("s1"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("s2"),
    )
    return (
        stats.select(
            "term",
            F.col("df").cast("bigint").alias("doc_freq"),
            F.col("s1").cast("bigint").alias("total_count"),
            F.round(
                (F.col("df") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                    "double"
                )
                / (F.col("df") * F.col("s1")).cast("double"),
                6,
            ).alias("burstiness"),
        )
        .orderBy(F.desc("total_count"), "term")
        .limit(_BURST_TOP)
    )
