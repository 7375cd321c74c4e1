"""Sixtieth wave: interval-overlap join and readability scoring.

join_interval_overlap is the missing member of the temporal-join family:
join_asof matches points to latest-points, join_range_banded matches
points to intervals — this matches INTERVALS to INTERVALS (user sessions x
incident windows), the shape behind incident-impact analysis, ad-flight
attribution and maintenance-window exclusion, banded on covered hours so
candidate generation stays an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_IO_GAP_US = 600_000_000  # 10-minute session gap
_IO_TOP_HOURS = 20        # busiest hours become "incident windows"


@register(
    "join_interval_overlap",
    oracle=f"""
WITH scoped AS (
  SELECT user_id, event_id, epoch_us(ts) AS us
  FROM events WHERE user_id % 10 = 0
), flagged AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > {_IO_GAP_US} THEN 1 ELSE 0 END
           AS is_new
  FROM scoped
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), numbered AS (
  SELECT user_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM flagged
), sessions AS (
  SELECT user_id, sess, MIN(us) AS s_start,
         MAX(us) + 600000000 AS s_end
  FROM numbered GROUP BY user_id, sess
), hourly AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS h_start, COUNT(*) AS n
  FROM events GROUP BY 1
), incidents AS (
  SELECT h_start, h_start + 3600000000 AS h_end,
         ROW_NUMBER() OVER (ORDER BY n DESC, h_start) AS incident_rank
  FROM hourly
  QUALIFY incident_rank <= {_IO_TOP_HOURS}
), sess_buckets AS (
  SELECT s.user_id, s.sess, s.s_start, s.s_end,
         UNNEST(range(s.s_start // 3600000000,
                      s.s_end // 3600000000 + 1)) AS bkt
  FROM sessions s
), cand AS (
  SELECT DISTINCT b.user_id, b.sess, b.s_start, b.s_end,
         i.incident_rank, i.h_start, i.h_end
  FROM sess_buckets b
  JOIN incidents i ON i.h_start // 3600000000 = b.bkt
)
SELECT user_id, CAST(sess AS BIGINT) AS sess, incident_rank,
       CAST(GREATEST(s_start, h_start) AS BIGINT) AS overlap_start_us,
       CAST(LEAST(s_end, h_end) - GREATEST(s_start, h_start) AS BIGINT)
         AS overlap_us
FROM cand
WHERE LEAST(s_end, h_end) - GREATEST(s_start, h_start) > 0
ORDER BY user_id, sess, incident_rank
""",
    description="Interval x interval overlap join: 10-minute-gap user "
    f"sessions against the {_IO_TOP_HOURS} busiest hours ('incident "
    "windows'), emitting each overlapping (session, incident) pair with "
    "its exact overlap duration — the temporal-join shape behind "
    "incident-impact analysis and ad-flight attribution that neither "
    "join_asof (point-to-point) nor join_range_banded (point-to-"
    "interval) covers. Banding: each session explodes into the hour "
    "buckets it SPANS (sessions are short, so a handful of rows each), "
    "incidents key on their own hour, and candidates come from a pure "
    "equi-join on bucket — the standard trick that turns the quadratic "
    "interval predicate into a linear shuffle; DISTINCT collapses "
    "multi-bucket duplicates before the exact GREATEST/LEAST overlap "
    "verify. Sessions carry their 10-minute inactivity tail, so a "
    "single-event session is still a 10-minute interval. All arithmetic "
    "is integer microseconds (epoch_us on both "
    "engines), so every overlap duration hash-matches exactly.",
    tags=("join", "events", "timeseries"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    scoped = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 10 == 0)
        .select("user_id", "event_id", us.alias("us"))
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("us").over(w)
    sessions = (
        scoped.withColumn(
            "is_new",
            F.when(prev.isNull() | (F.col("us") - prev > _IO_GAP_US), 1).otherwise(0),
        )
        .withColumn("sess", F.sum("is_new").over(run))
        .groupBy("user_id", "sess")
        .agg(
            F.min("us").alias("s_start"),
            (F.max("us") + _IO_GAP_US).alias("s_end"),
        )
    )
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.unix_micros(F.date_trunc("hour", "ts").cast("timestamp")).alias(
                "h_start"
            )
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    incidents = (
        hourly.withColumn(
            "incident_rank",
            F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("h_start"))),
        )
        .filter(F.col("incident_rank") <= _IO_TOP_HOURS)
        .select(
            "h_start", (F.col("h_start") + 3_600_000_000).alias("h_end"), "incident_rank"
        )
    )
    sess_buckets = sessions.select(
        "user_id",
        "sess",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.floor(F.col("s_start") / 3_600_000_000),
                F.floor(F.col("s_end") / 3_600_000_000),
            )
        ).alias("bkt"),
    )
    cand = (
        sess_buckets.join(
            F.broadcast(
                incidents.withColumn(
                    "ibkt", F.floor(F.col("h_start") / 3_600_000_000)
                )
            ),
            F.col("ibkt") == F.col("bkt"),
        )
        .select(
            "user_id", "sess", "s_start", "s_end", "incident_rank", "h_start", "h_end"
        )
        .distinct()
    )
    ov_start = F.greatest("s_start", "h_start")
    ov = F.least("s_end", "h_end") - ov_start
    return (
        cand.filter(ov > 0)
        .select(
            "user_id",
            F.col("sess").cast("bigint").alias("sess"),
            "incident_rank",
            ov_start.cast("bigint").alias("overlap_start_us"),
            ov.cast("bigint").alias("overlap_us"),
        )
        
    )


@register(
    "text_readability_fk",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(trim(lower(text)), ' ') AS tk
  FROM documents WHERE length(trim(text)) > 0
), per_word AS (
  SELECT doc_id, u.w,
         GREATEST(len(regexp_extract_all(u.w, '[aeiouy]+')), 1) AS syl
  FROM toks, LATERAL (SELECT UNNEST(tk) AS w) u
), agg AS (
  SELECT doc_id,
         COUNT(*) AS n_words,
         SUM(syl) AS n_syllables,
         COUNT(*) FILTER (WHERE syl >= 3) AS n_polysyl
  FROM per_word GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * CAST(n_words AS DOUBLE)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
         AS flesch_ease,
       round(0.39 * CAST(n_words AS DOUBLE)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 4)
         AS fk_grade,
       round(CAST(n_polysyl AS DOUBLE) / n_words, 6) AS polysyl_frac
FROM agg
ORDER BY doc_id
""",
    description="Flesch reading-ease and Flesch-Kincaid grade per "
    "document from exact integer counts: words, vowel-group syllable "
    "estimates (the standard [aeiouy]+ heuristic, min 1 per word), and "
    "the polysyllabic fraction (SMOG's input) — the readability axis of "
    "quality scoring that text_quality_score's length/punctuation "
    "ratios don't capture; low-ease outliers are a curation drop "
    "signal. The fixture corpus has no sentence punctuation, so the "
    "per-document 'sentence' degenerates to the whole document (one "
    "sentence of n_words words) — formulas applied with S=1, stated "
    "explicitly rather than faked. Pure JVM regexp_extract_all + one "
    "hash-aggregate; no shuffle beyond the per-doc combine.",
    tags=("text", "curation", "llm"),
)
def text_readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.trim(F.lower("text")), " ")
    per_word = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.explode(toks).alias("w"))
        .select(
            "doc_id",
            F.greatest(
                F.size(F.regexp_extract_all("w", F.lit("[aeiouy]+"), F.lit(0))),
                F.lit(1),
            ).alias("syl"),
        )
    )
    agg = per_word.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("syl").alias("n_syllables"),
        F.count(F.when(F.col("syl") >= 3, 1)).alias("n_polysyl"),
    )
    nw = F.col("n_words").cast("double")
    ns = F.col("n_syllables").cast("double")
    return agg.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_syllables").cast("bigint").alias("n_syllables"),
        F.round(F.lit(206.835) - F.lit(1.015) * nw - F.lit(84.6) * (ns / F.col("n_words")), 4).alias(
            "flesch_ease"
        ),
        F.round(F.lit(0.39) * nw + F.lit(11.8) * (ns / F.col("n_words")) - F.lit(15.59), 4).alias(
            "fk_grade"
        ),
        F.round(F.col("n_polysyl").cast("double") / F.col("n_words"), 6).alias(
            "polysyl_frac"
        ),
    )
