"""Fifty-ninth wave: temperature-scaled corpus mixing and funnel latency.

curation_mixture_temperature is the Pile/LLaMA-style sampling knob
(w_s ∝ n_s^τ): τ=1 keeps natural proportions, τ=0 equalizes sources
(curation_mix_weights' target), values between up-weight the tail without
drowning the head — the single most-tuned number in LLM pre-training data
mixes.  events_time_to_convert measures funnel LATENCY (the funnels
already measure conversion RATE): exact order-statistic percentiles of
view→purchase time per converting user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_MT_TAU = 0.7


@register(
    "curation_mixture_temperature",
    oracle=f"""
WITH src AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(n_chars) AS n_chars_total
  FROM documents GROUP BY source
), powed AS (
  SELECT source, n_docs, n_chars_total,
         CAST(round(pow(CAST(n_chars_total AS DOUBLE), {_MT_TAU!r}), 9)
              AS DECIMAL(28,9)) AS p
  FROM src
), tot AS (
  SELECT SUM(p) AS sp, SUM(n_chars_total) AS sc FROM powed
)
SELECT s.source,
       CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(s.n_chars_total AS BIGINT) AS n_chars_total,
       round(CAST(s.n_chars_total AS DOUBLE)
             / CAST(t.sc AS DOUBLE), 6) AS natural_share,
       round(CAST(CAST(s.p AS VARCHAR) AS DOUBLE)
             / CAST(CAST(t.sp AS VARCHAR) AS DOUBLE), 6) AS temp_weight,
       round((CAST(CAST(s.p AS VARCHAR) AS DOUBLE)
              / CAST(CAST(t.sp AS VARCHAR) AS DOUBLE))
             / (CAST(s.n_chars_total AS DOUBLE) / CAST(t.sc AS DOUBLE)), 6)
         AS upsample_factor
FROM powed s CROSS JOIN tot t
ORDER BY s.source
""",
    description=f"Temperature-scaled training-mix weights (w_s ∝ "
    f"mass_s^τ, τ={_MT_TAU}): the Pile/LLaMA-style sampling rule that "
    "sits between natural proportions (τ=1) and the uniform mix "
    "curation_mix_weights computes (τ=0) — per source, the natural "
    "share, the temperature weight, and the implied up/down-sampling "
    "factor a sampler must apply (tail sources get factors > 1, head "
    "sources < 1). The pow() is evaluated once per SOURCE (a bounded "
    "set), rounded to 9 dp and normalized through exact DECIMAL sums — "
    "the engine's libm-determinism contract. Shape: one per-source "
    "aggregate + a 1-row normalizer; composing with "
    "curation_sample_weighted's md5 sampler turns these weights into "
    "an actual deterministic resample.",
    tags=("curation", "llm"),
)
def curation_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )
    powed = src.withColumn(
        "p",
        F.round(F.pow(F.col("n_chars_total").cast("double"), F.lit(_MT_TAU)), 9).cast(
            "decimal(28,9)"
        ),
    )
    tot = powed.agg(F.sum("p").alias("sp"), F.sum("n_chars_total").alias("sc"))
    nat = F.col("n_chars_total").cast("double") / F.col("sc").cast("double")
    tw = F.col("p").cast("double") / F.col("sp").cast("double")
    return (
        powed.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_chars_total").cast("bigint").alias("n_chars_total"),
            F.round(nat, 6).alias("natural_share"),
            F.round(tw, 6).alias("temp_weight"),
            F.round(tw / nat, 6).alias("upsample_factor"),
        )
        
    )


@register(
    "events_time_to_convert",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(ts) FILTER (WHERE event_type = 'view') AS first_view,
         MIN(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
  FROM events GROUP BY user_id
), conv AS (
  SELECT user_id,
         epoch_us(first_purchase) - epoch_us(first_view) AS sec
  FROM firsts
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_view
), ranked AS (
  SELECT user_id, sec,
         ROW_NUMBER() OVER (ORDER BY sec, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM conv
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       round(CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN sec END) AS DOUBLE)
             / 60000000.0, 6) AS median_minutes,
       round(CAST(MIN(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN sec END)
                  AS DOUBLE) / 60000000.0, 6) AS p90_minutes,
       round(CAST(CAST(SUM(CAST(sec AS DECIMAL(24,0))) AS VARCHAR) AS DOUBLE)
             / MAX(n) / 60000000.0, 6) AS mean_minutes
FROM ranked
""",
    description="Funnel LATENCY: per converting user the time from first "
    "'view' to first 'purchase', summarized as exact lower-median, p90 "
    "(⌈0.9n⌉-th order statistic) and decimal-exact mean, in minutes — "
    "the companion every conversion-RATE funnel "
    "(events_funnel_conversion / events_funnel_windowed) needs, because "
    "'3% convert' and '3% convert within a median 4 minutes' drive "
    "different product decisions. Per-user firsts are one min-aggregate "
    "(conditional MIN, no per-user sort); the percentile rank runs over "
    "the USER domain (already thousands of times smaller than events) — "
    "the rank runs as the two-pass range-partitioned form (operators/"
    "ranking.py: latency-range buckets from a broadcast envelope — no "
    "single-partition sort at any SF), same oracle. All latencies "
    "integer microseconds until the final /60 projections.",
    tags=("events", "funnel", "stats"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    firsts = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "first_view"
            ),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "first_purchase"
            ),
        )
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        "user_id",
        (
            F.unix_micros(F.col("first_purchase").cast("timestamp"))
            - F.unix_micros(F.col("first_view").cast("timestamp"))
        ).alias("sec"),
    )
    stats = conv.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("sec").alias("slo"),
        F.max("sec").alias("shi"),
    )
    ranked = RK.distributed_row_number(
        conv.crossJoin(F.broadcast(stats)),
        ["sec", "user_id"],
        RK.range_bucket(F.col("sec"), F.col("slo"), F.col("shi")),
        out="rn",
    ).select("sec", "rn", "n")
    median = F.min(
        F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("sec"))
    )
    p90 = F.min(
        F.when(
            F.col("rn") == F.ceil(F.col("n") * 0.9).cast("bigint"), F.col("sec")
        )
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.round(median.cast("double") / 60000000.0, 6).alias("median_minutes"),
        F.round(p90.cast("double") / 60000000.0, 6).alias("p90_minutes"),
        F.round(
            F.sum(F.col("sec").cast("decimal(24,0)")).cast("double")
            / F.max("n")
            / 60000000.0,
            6,
        ).alias("mean_minutes"),
    )
