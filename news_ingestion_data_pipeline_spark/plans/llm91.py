"""Ninety-first wave: privacy analytics over the corpus.

Three privacy stages a training-data pipeline runs before release
(complementing curation_k_anonymity and curation_pii_redact):

  * l-diversity — k-anonymity's blind spot: a quasi-identifier group
    can be large (k ok) yet carry ONE sensitive value, so membership
    still leaks the attribute.  Per-QI-group distinct-sensitive count
    and entropy, flagged against l >= 2.
  * re-identification risk profile — the prosecutor-model risk report:
    bucket QI groups by size (unique / small / safe), report record
    shares and the expected re-id probability sum(1/k)/n.
  * differentially-private noisy counts — the release artifact itself:
    per-language counts + Laplace(1/eps) noise via the standard
    inverse-CDF transform.  The uniform draw is seeded
    deterministically (md5-arithmetic, the registry's established
    cross-engine RNG) so both engines derive the SAME sample — a real
    DP release swaps in a secret seed; the mechanism, sensitivity-1
    count query, and epsilon accounting are exactly this shape.

All three are map + one-or-two hash aggregates — the 100 TB story is
identical to grouped counting: map-side combinable, no skew beyond the
QI-group distribution itself (which is precisely what they measure).
Cross-engine float rule: every ln() is rounded to 9 decimals and summed
through exact DECIMAL(28,12) (the events_entropy_by_user contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_DEC = "decimal(28,12)"


@register(
    "curation_l_diversity",
    oracle="""
WITH per_val AS (
  SELECT source, CAST(n_chars // 64 AS BIGINT) AS len_band, lang,
         COUNT(*) AS c
  FROM documents
  GROUP BY 1, 2, 3
), per_grp AS (
  SELECT source, len_band,
         SUM(c) AS k,
         COUNT(*) AS l_distinct,
         CAST(SUM(CAST(c * round(ln(c), 9) AS DECIMAL(28,12)))
              AS DOUBLE) AS sum_c_lnc
  FROM per_val
  GROUP BY source, len_band
)
SELECT source, len_band,
       CAST(k AS BIGINT) AS k,
       CAST(l_distinct AS BIGINT) AS l_distinct,
       round(round(ln(k), 9) - sum_c_lnc / k, 6) AS entropy_l,
       (l_distinct >= 2) AS diverse_ok
FROM per_grp
ORDER BY source, len_band
""",
    description="l-diversity audit — k-anonymity's complement: for each "
    "quasi-identifier group (source, 64-char length band) count the "
    "DISTINCT sensitive values (lang) and their Shannon entropy; a "
    "group with l < 2 leaks the attribute to anyone who can place a "
    "document in it, no matter how large k is. Entropy comes from the "
    "identity H = ln(k) - sum(c*ln c)/k so it needs only per-value "
    "counts — two chained hash aggregates, both map-side combinable, "
    "no window state; ln values rounded to 9 decimals and summed "
    "through exact DECIMAL so both engines agree bit-for-bit.",
    tags=("curation", "privacy", "llm"),
)
def curation_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "source",
        F.floor(F.col("n_chars") / 64).cast("bigint").alias("len_band"),
        "lang",
    )
    per_val = d.groupBy("source", "len_band", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_grp = per_val.groupBy("source", "len_band").agg(
        F.sum("c").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        F.sum(
            (F.col("c") * F.round(F.log("c"), 9)).cast(_DEC)
        )
        .cast("double")
        .alias("sum_c_lnc"),
    )
    entropy = F.round(
        F.round(F.log("k"), 9) - F.col("sum_c_lnc") / F.col("k"), 6
    )
    return per_grp.select(
        "source",
        "len_band",
        F.col("k").cast("bigint").alias("k"),
        "l_distinct",
        entropy.alias("entropy_l"),
        (F.col("l_distinct") >= 2).alias("diverse_ok"),
    )


@register(
    "curation_reid_risk_profile",
    oracle="""
WITH grp AS (
  SELECT source, CAST(n_chars // 64 AS BIGINT) AS len_band,
         COUNT(*) AS k
  FROM documents
  GROUP BY 1, 2
), total AS (
  SELECT SUM(k) AS n FROM grp
)
SELECT CASE WHEN k = 1 THEN '1_unique'
            WHEN k <= 4 THEN '2_small'
            ELSE '3_safe' END AS risk_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_records,
       round(SUM(k) * 100.0 / (SELECT n FROM total), 4) AS pct_records,
       round(CAST(SUM(CAST(round(1.0 / k, 9) * k AS DECIMAL(28,12)))
                  AS DOUBLE) / (SELECT n FROM total), 6)
         AS expected_reid_share
FROM grp
GROUP BY 1
ORDER BY risk_bucket
""",
    description="Prosecutor-model re-identification risk report over the "
    "quasi-identifier partition (source, 64-char length band): bucket "
    "QI groups by size — unique (k=1, certain re-id), small (k<=4), "
    "safe — with group/record counts, record shares, and each bucket's "
    "contribution to the expected re-id probability sum(1/k)/n (each "
    "of a group's k records is re-identified with chance 1/k). The "
    "whole report is one hash aggregate over per-group sizes plus a "
    "broadcast scalar total — the shape survives any corpus size "
    "because only (QI, k) pairs shuffle, never records.",
    tags=("curation", "privacy", "llm"),
)
def curation_reid_risk_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    grp = (
        t(spark, sf_dir, "documents")
        .groupBy(
            "source",
            F.floor(F.col("n_chars") / 64).cast("bigint").alias("len_band"),
        )
        .agg(F.count(F.lit(1)).alias("k"))
    )
    total = grp.agg(F.sum("k").alias("n"))
    bucket = (
        F.when(F.col("k") == 1, "1_unique")
        .when(F.col("k") <= 4, "2_small")
        .otherwise("3_safe")
    )
    per_bucket = grp.groupBy(bucket.alias("risk_bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("k").cast("bigint").alias("n_records"),
        F.sum(
            (F.round(F.lit(1.0) / F.col("k"), 9) * F.col("k")).cast(_DEC)
        )
        .cast("double")
        .alias("sum_inv_k"),
    )
    return (
        per_bucket.crossJoin(F.broadcast(total))
        .select(
            "risk_bucket",
            "n_groups",
            "n_records",
            F.round(F.col("n_records") * 100.0 / F.col("n"), 4).alias(
                "pct_records"
            ),
            F.round(F.col("sum_inv_k") / F.col("n"), 6).alias(
                "expected_reid_share"
            ),
        )
        
    )


#: md5-uniform in [0,1): 13 hex chars = 52 bits, the registry's
#: established cross-engine deterministic RNG
_U_SQL = (
    "(CAST(CAST('0x' || substr(md5('dp-seed-1' || lang), 1, 13) AS BIGINT)"
    " AS DOUBLE) / 4503599627370496.0)"
)


@register(
    "curation_dp_noisy_counts",
    oracle=f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS true_n FROM documents GROUP BY lang
), noise AS (
  SELECT lang, true_n, {_U_SQL} - 0.5 AS u
  FROM counts
)
SELECT lang,
       CAST(true_n AS BIGINT) AS true_n,
       round(true_n + (CASE WHEN u < 0 THEN 1.0 ELSE -1.0 END)
             * round(ln(1.0 - 2.0 * abs(u)), 9), 4) AS noisy_n,
       CAST(1.0 AS DOUBLE) AS epsilon
FROM noise
ORDER BY lang
""",
    description="Differentially-private count release (Laplace "
    "mechanism, eps=1, sensitivity 1): per-language document counts "
    "plus Laplace(1/eps) noise derived by the inverse-CDF transform "
    "sign(u-.5)*ln(1-2|u-.5|) from a deterministic md5-uniform draw "
    "(13 hex chars / 2^52 — the registry's cross-engine seeded RNG; a "
    "production release swaps in a secret seed, everything else is "
    "identical). ln rounded to 9 decimals before the final 4-decimal "
    "release rounding keeps both engines bit-identical. One hash "
    "aggregate + a map-side noise expression — the release costs the "
    "same as the count query at any corpus size.",
    tags=("curation", "privacy", "llm"),
)
def curation_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp-seed-1"), F.col("lang"))), 1, 13),
            16,
            10,
        ).cast("double")
        / F.lit(4503599627370496.0)
    ) - 0.5
    noisy = F.round(
        F.col("true_n")
        + F.when(u < 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.round(F.log(F.lit(1.0) - 2.0 * F.abs(u)), 9),
        4,
    )
    return counts.select(
        "lang",
        F.col("true_n").cast("bigint").alias("true_n"),
        noisy.alias("noisy_n"),
        F.lit(1.0).alias("epsilon"),
    )
