"""Eleventh wave: experimentation and audio-retrieval operators — a
two-proportion A/B z-test, Herfindahl concentration per event type, and
Shazam-lite audio fingerprints over the real WAV decode path — each
with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_ab_test_z",
    oracle="""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS cohort,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 13 THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
), c AS (
  SELECT cohort, COUNT(*) AS n, SUM(converted) AS conv
  FROM per_user GROUP BY cohort
), s AS (
  SELECT
    (SELECT n FROM c WHERE cohort = 0) AS n0,
    (SELECT conv FROM c WHERE cohort = 0) AS conv0,
    (SELECT n FROM c WHERE cohort = 1) AS n1,
    (SELECT conv FROM c WHERE cohort = 1) AS conv1
)
SELECT n0, CAST(conv0 AS BIGINT) AS conv0,
       n1, CAST(conv1 AS BIGINT) AS conv1,
       CASE WHEN conv0 + conv1 > 0 AND conv0 + conv1 < n0 + n1 THEN
         round((CAST(conv1 AS DOUBLE) / n1 - CAST(conv0 AS DOUBLE) / n0)
               / sqrt((CAST(conv0 + conv1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(conv0 + conv1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1)), 6)
       END AS z_score,
       CASE WHEN conv0 + conv1 > 0 AND conv0 + conv1 < n0 + n1 THEN
         abs((CAST(conv1 AS DOUBLE) / n1 - CAST(conv0 AS DOUBLE) / n0)
             / sqrt((CAST(conv0 + conv1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(conv0 + conv1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1))) > 1.96
       ELSE FALSE END AS significant_95
FROM s
""",
    description="Two-proportion z-test — the A/B experimentation "
    "primitive: users split into deterministic cohorts (user_id parity "
    "stands in for the assignment hash), per-user conversion = a "
    ">=13-purchase threshold (splits the fixture near its median), "
    "pooled-proportion z-score with the 1.96 two-sided 95% gate; "
    "degenerate all/none pools emit NULL z through a guard both engines "
    "mirror. Everything up to the final formula is integer counts "
    "(exact); the z itself is a fixed sequence of IEEE ops identical in "
    "both engines. Shape: one (user) aggregate, one 2-row cohort "
    "aggregate, scalar algebra — at 100 TB the heavy part is the "
    "per-user dedup-to-flag pass, which is map-side-partial friendly.",
    tags=("events", "stats", "experimentation"),
)
def events_ab_test_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int")) >= 13
            )
            .cast("int")
            .alias("converted")
        )
        .select((F.col("user_id") % 2).alias("cohort"), "converted")
    )
    c = per_user.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    s = (
        c.groupBy()
        .pivot("cohort", [0, 1])
        .agg(F.first("n").alias("n"), F.first("conv").alias("conv"))
        .select(
            F.col("0_n").alias("n0"),
            F.col("0_conv").alias("conv0"),
            F.col("1_n").alias("n1"),
            F.col("1_conv").alias("conv1"),
        )
    )
    p0 = F.col("conv0").cast("double") / F.col("n0")
    p1 = F.col("conv1").cast("double") / F.col("n1")
    pp = (F.col("conv0") + F.col("conv1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    total_conv = F.col("conv0") + F.col("conv1")
    total_n = F.col("n0") + F.col("n1")
    nondegenerate = (total_conv > 0) & (total_conv < total_n)
    z = (p1 - p0) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return s.select(
        "n0",
        "conv0",
        "n1",
        "conv1",
        F.when(nondegenerate, F.round(z, 6)).alias("z_score"),
        F.when(nondegenerate, F.abs(z) > 1.96)
        .otherwise(F.lit(False))
        .alias("significant_95"),
    )


@register(
    "events_concentration_hhi",
    oracle="""
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS cnt
  FROM events GROUP BY event_type, user_id
), s AS (
  SELECT event_type, SUM(cnt) AS total, SUM(cnt * cnt) AS sum_sq,
         COUNT(*) AS n_users
  FROM c GROUP BY event_type
)
SELECT event_type, n_users,
       round(CAST(sum_sq AS DOUBLE) / (total * total), 6) AS hhi,
       round((total * total) / CAST(sum_sq AS DOUBLE), 6) AS effective_users
FROM s ORDER BY event_type
""",
    description="Herfindahl-Hirschman concentration per event type — "
    "'is this activity driven by a few users?': HHI = sum(c_u^2)/total^2 "
    "over the per-user activity distribution, and its reciprocal, the "
    "effective participant count (the diversity index). Pure integer "
    "power sums until one final division — NO logs, so unlike entropy "
    "this concentration measure is exactly deterministic with zero "
    "epsilon surface. Two aggregates sharing the (type, user) shuffle; "
    "both map-side-partial friendly.",
    tags=("events", "stats"),
)
def events_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = c.groupBy("event_type").agg(
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
        F.count(F.lit(1)).alias("n_users"),
    )
    hhi = F.col("sum_sq").cast("double") / (F.col("total") * F.col("total"))
    eff = (F.col("total") * F.col("total")) / F.col("sum_sq").cast("double")
    return s.select(
        "event_type",
        "n_users",
        F.round(hhi, 6).alias("hhi"),
        F.round(eff, 6).alias("effective_users"),
    )


@register(
    "multimodal_audio_fingerprint",
    oracle="""
WITH d AS (
  SELECT doc_id, (doc_id % 8) * 250 + 500 AS duration_ms
  FROM documents ORDER BY doc_id LIMIT 200
), s AS (
  SELECT doc_id, unnest(range(0, 8 * duration_ms)) AS i FROM d
), v AS (
  SELECT doc_id, CAST(i // 2000 AS INT) AS win_no,
    (31 * doc_id + 7 * i) % 65536 - 32768 AS smp
  FROM s
), rms AS (
  SELECT doc_id, win_no,
    sqrt(CAST(CAST(SUM(smp * smp) AS VARCHAR) AS DOUBLE) / 2000) AS rms
  FROM v GROUP BY doc_id, win_no
), bits AS (
  SELECT doc_id, win_no,
    CASE WHEN rms > LAG(rms) OVER (PARTITION BY doc_id ORDER BY win_no)
         THEN '1' ELSE '0' END AS bit
  FROM rms
)
SELECT doc_id AS media_id,
       COUNT(*) + 1 AS n_windows,
       string_agg(bit, '' ORDER BY win_no) AS fingerprint_bits,
       md5(string_agg(bit, '' ORDER BY win_no)) AS fp_md5
FROM bits WHERE win_no > 0
GROUP BY doc_id
ORDER BY media_id
""",
    description="Audio fingerprinting (Shazam-lite, Wang 2003's "
    "energy-delta family): real WAV bytes -> RIFF decode -> 250 ms RMS "
    "windows (the existing Arrow mapInPandas stage) -> one bit per "
    "window transition (energy rose vs fell) -> the per-media bitstring "
    "plus its md5 — the compact content key that audio dedup joins on "
    "exactly like text minhash buckets. RMS is an integer "
    "sum-of-squares so the rose/fell comparisons are exactly "
    "deterministic; the oracle regenerates the PCM from the closed-form "
    "waveform and replays the whole chain. At scale the fingerprint "
    "table is the audio corpus' dedup index: equality joins, "
    "hamming-banded for near-match.",
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").orderBy("doc_id").limit(200)
    media = mm.synthesize_media_real(docs, kind="audio").repartition(
        8, "media_id"
    )
    wins = mm.extract_audio_features(media, window_ms=250, decoder="real")
    w = Window.partitionBy("media_id").orderBy("win_no")
    bits = wins.select(
        "media_id",
        "win_no",
        F.when(F.col("rms") > F.lag("rms").over(w), F.lit("1"))
        .otherwise(F.lit("0"))
        .alias("bit"),
    ).filter(F.col("win_no") > 0)
    fp = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("win_no", "bit"))),
            lambda s: s["bit"],
        ),
        "",
    )
    return (
        bits.groupBy("media_id")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_windows"),
            fp.alias("fingerprint_bits"),
        )
        .select(
            "media_id",
            "n_windows",
            "fingerprint_bits",
            F.md5("fingerprint_bits").alias("fp_md5"),
        )
        
    )
