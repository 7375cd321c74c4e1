"""Hundred-thirty-fifth wave: bitmap audience overlap and the
Mantel-Haenszel pooled risk ratio.

  * agg_bitmap_audience_overlap — the bitmap-index trick for EXACT
    set operations at scale: user ids pack into 64-bit words
    (word = id div 64, bit = id mod 64) aggregated with bit_or per
    event type; audience intersection/union then run as word-aligned
    AND/OR + popcount — no distinct-shuffle of raw ids per pair, and
    the bitmaps compose (the roaring-bitmap idea, flat-encoded).
    Emits exact |A|, |B|, |A∩B|, |A∪B| and Jaccard-milli for every
    type pair.
  * events_mantel_haenszel — the stratified 2x2 workhorse: pooled
    risk ratio of "purchase given error-touched" across user-cohort
    strata, the estimator that survives confounding-by-stratum where
    the crude ratio (and Simpson's examples) mislead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "agg_bitmap_audience_overlap",
    oracle="""
WITH m AS (
  SELECT DISTINCT event_type, user_id // 64 AS word, user_id % 64 AS bit
  FROM events
),
words AS (
  SELECT event_type, word,
         CAST(bit_or(CASE WHEN bit = 63
                          THEN (-9223372036854775807::BIGINT - 1)
                          ELSE 1::BIGINT << CAST(bit AS INT) END) AS BIGINT)
           AS w
  FROM m GROUP BY event_type, word
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.w AS wa, b.w AS wb
  FROM words a JOIN words b
    ON a.word = b.word AND a.event_type < b.event_type
),
agg AS (
  SELECT type_a, type_b,
         SUM(bit_count(wa & wb)) AS n_overlap
  FROM pairs GROUP BY type_a, type_b
),
sizes AS (
  SELECT event_type, SUM(bit_count(w)) AS n FROM words GROUP BY event_type
)
SELECT g.type_a, g.type_b,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(g.n_overlap AS BIGINT) AS n_overlap,
       CAST(sa.n + sb.n - g.n_overlap AS BIGINT) AS n_union,
       CAST((1000 * g.n_overlap) // (sa.n + sb.n - g.n_overlap) AS BIGINT)
         AS jaccard_milli
FROM agg g
JOIN sizes sa ON sa.event_type = g.type_a
JOIN sizes sb ON sb.event_type = g.type_b
ORDER BY type_a, type_b
""",
    description="Exact audience overlap via bitmap indexes: user ids "
    "pack into 64-bit words (word = id div 64) aggregated with bit_or "
    "per event type — |A| is a popcount sum, |A∩B| is word-aligned AND "
    "+ popcount on the equi-joined word tables, never a distinct-join "
    "of raw ids per pair. The flat-encoded form of the roaring-bitmap "
    "pattern: bitmaps build once (one shuffle keyed (type, word)), "
    "every pairwise overlap after that touches only word rows — at "
    "100 TB with 10^9 users a type's audience is ~16 MB of words, and "
    "set algebra on audiences stops touching the event log entirely. "
    "Bit 63 uses the signed min-long literal (the 1<<63 overflow trap), "
    "and the word-OR is cast off DuckDB's HUGEINT before popcount — "
    "both pinned by wave 122's findings. All-integer output incl. "
    "Jaccard-milli.",
    tags=("agg", "events", "sketch"),
)
def agg_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("user_id div 64").alias("word"),
            (F.col("user_id") % 64).cast("int").alias("bit"),
        )
        .distinct()
    )
    pows = F.array(
        *[F.lit(1 << k).cast("bigint") for k in range(63)],
        F.lit(-(1 << 63)).cast("bigint"),
    )
    words = (
        m.groupBy("event_type", "word")
        .agg(
            F.bit_or(F.element_at(pows, F.col("bit") + 1)).alias("w")
        )
        .localCheckpoint()  # reused by sizes and both pair sides
    )
    sizes = words.groupBy("event_type").agg(
        F.sum(F.bit_count("w")).alias("n")
    )
    a, b = words.alias("a"), words.alias("b")
    pairs = a.join(
        b,
        (F.col("a.word") == F.col("b.word"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.w").alias("wa"),
        F.col("b.w").alias("wb"),
    )
    agg = pairs.groupBy("type_a", "type_b").agg(
        F.sum(F.bit_count(F.col("wa").bitwiseAND(F.col("wb")))).alias(
            "n_overlap"
        )
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        agg.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            (F.col("n_a") + F.col("n_b") - F.col("n_overlap"))
            .cast("bigint")
            .alias("n_union"),
            F.expr(
                "CAST((1000 * n_overlap) div (n_a + n_b - n_overlap)"
                " AS BIGINT)"
            ).alias("jaccard_milli"),
        )
        
    )


@register(
    "events_mantel_haenszel",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         user_id % 5 AS stratum,
         CASE WHEN SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS exposed,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
cells AS (
  SELECT stratum,
         SUM(CASE WHEN exposed = 1 AND converted = 1 THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN exposed = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN exposed = 0 AND converted = 1 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN exposed = 0 THEN 1 ELSE 0 END) AS n0,
         COUNT(*) AS n
  FROM per_user GROUP BY stratum
),
terms AS (
  SELECT stratum, a, b, n1, n0, n,
         CAST(round(CAST(a * n0 AS DOUBLE) / n, 9) AS DECIMAL(18,9)) AS num9,
         CAST(round(CAST(b * n1 AS DOUBLE) / n, 9) AS DECIMAL(18,9)) AS den9
  FROM cells
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
       CAST(CAST(SUM(num9) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(den9) AS VARCHAR) AS DOUBLE) AS rr_mh,
       CAST(SUM(a) AS BIGINT) AS exposed_conversions,
       CAST(SUM(b) AS BIGINT) AS unexposed_conversions
FROM terms
""",
    description="Mantel-Haenszel pooled risk ratio across user-cohort "
    "strata (user_id mod 5): RR_MH = Σ(a_i·n0_i/n_i) / Σ(b_i·n1_i/n_i) "
    "for the 2x2 tables exposed(error-touched) × converted(purchased) — "
    "the stratified estimator that stays consistent under confounding-"
    "by-stratum where the crude pooled ratio misleads (the estimator "
    "side of the agg_simpsons_reversal detector). Per-stratum terms are "
    "single IEEE divisions snapped to 9-dp decimals and folded through "
    "exact decimal sums, so the pooled ratio is bit-identical. One "
    "per-user aggregate then a 5-row reduce.",
    tags=("events", "stats", "causal"),
)
def events_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "error", 1).otherwise(0)
                )
                >= 14
            )
            .cast("int")
            .alias("exposed"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
        .select(
            (F.col("user_id") % 5).alias("stratum"), "exposed", "converted"
        )
    )
    cells = per_user.groupBy("stratum").agg(
        F.sum(
            F.when((F.col("exposed") == 1) & (F.col("converted") == 1), 1)
            .otherwise(0)
        ).alias("a"),
        F.sum(F.col("exposed")).alias("n1"),
        F.sum(
            F.when((F.col("exposed") == 0) & (F.col("converted") == 1), 1)
            .otherwise(0)
        ).alias("b"),
        F.sum(1 - F.col("exposed")).alias("n0"),
        F.count(F.lit(1)).alias("n"),
    )
    terms = cells.select(
        "a",
        "b",
        F.round(
            (F.col("a") * F.col("n0")).cast("double") / F.col("n"), 9
        )
        .cast("decimal(18,9)")
        .alias("num9"),
        F.round(
            (F.col("b") * F.col("n1")).cast("double") / F.col("n"), 9
        )
        .cast("decimal(18,9)")
        .alias("den9"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_strata"),
        (
            F.sum("num9").cast("double") / F.sum("den9").cast("double")
        ).alias("rr_mh"),
        F.sum("a").cast("bigint").alias("exposed_conversions"),
        F.sum("b").cast("bigint").alias("unexposed_conversions"),
    )
