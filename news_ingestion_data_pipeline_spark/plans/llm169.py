"""Hundred-sixty-ninth wave: LSH S-curve calibration — does the
deployed MinHash-LSH configuration (32 permutations, 8 bands x 4 rows)
behave like its theory says it should ON THIS CORPUS?

The banding construction promises P(candidate | jaccard = s) =
1 - (1 - s^r)^b. This eval measures the EMPIRICAL candidate rate per
exact-jaccard decile over the blocked intersecting-pair universe and
reports it next to the analytic curve — the calibration readout a
dedup pipeline owner checks before trusting a threshold choice (a
mis-tuned band count shows up as the empirical curve shifted off the
analytic one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.operators import dedup as DD
from news_ingestion_data_pipeline_spark.plans.oracle_sqlgen import (
    _band_union,
    _sig_cols,
)
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_SC_R, _SC_B = 4, 8  # rows per band, bands (32 permutations)
#: analytic curve values precomputed once and embedded as identical
#: literals in both engines (zero cross-libm pow exposure)
_SC_ANALYTIC = [
    round(1 - (1 - ((k + 0.5) / 10) ** _SC_R) ** _SC_B, 4) for k in range(10)
]
_SQL_ANALYTIC = (
    "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _SC_ANALYTIC) + "]"
)
_MINHASH_P = 2147483647


@register(
    "dedup_lsh_scurve_eval",
    oracle=f"""
WITH norm AS (
  SELECT doc_id AS id, lang,
         CAST(round(n_chars, -2) AS BIGINT) AS lb,
         {SQL_NORM.format(col='text')} AS s
  FROM documents
), doc AS (
  SELECT id, lang, lb, list_distinct(list_transform(
    range(1, greatest(length(s) - 3, 1)),
    i -> CAST('0x' || substr(md5(substr(s, CAST(i AS INT), 5)), 1, 15) AS BIGINT)
  )) AS shingles
  FROM norm
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         len(list_intersect(a.shingles, b.shingles)) AS inter,
         len(a.shingles) AS sza, len(b.shingles) AS szb
  FROM doc a JOIN doc b
    ON a.lang = b.lang AND a.lb = b.lb AND a.id < b.id
  WHERE len(list_intersect(a.shingles, b.shingles)) > 0
), xrows AS (
  SELECT id, unnest(shingles) % {_MINHASH_P} AS x FROM doc
), sig AS (
  SELECT id,
    {_sig_cols(_SC_R * _SC_B)}
  FROM xrows GROUP BY id
), bands AS (
  {_band_union(_SC_R * _SC_B, _SC_B)}
), cand AS (
  SELECT DISTINCT a.id AS id_a, x.id AS id_b
  FROM bands a JOIN bands x
    ON a.band = x.band AND a.bucket = x.bucket AND a.id < x.id
), scored AS (
  SELECT LEAST(CAST(floor(round(inter * 1.0 / (sza + szb - inter), 6) * 10)
               AS BIGINT), 9) AS decile,
         (cand.id_a IS NOT NULL) AS is_cand
  FROM pairs LEFT JOIN cand
    ON cand.id_a = pairs.id_a AND cand.id_b = pairs.id_b
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT)
         AS n_candidates,
       round(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
         AS empirical_rate,
       {_SQL_ANALYTIC}[CAST(decile + 1 AS INT)] AS analytic_rate
FROM scored GROUP BY decile
""",
    description="LSH S-curve calibration for the deployed 32-perm / "
    "8-band / 4-row MinHash configuration: empirical "
    "P(candidate | jaccard decile) over the blocked intersecting-pair "
    "universe (same lang+length-bucket inverted-index blocking as "
    "dedup_ngram_jaccard — mandatory at scale) next to the analytic "
    "1-(1-s^4)^8 curve, whose 10 values are precomputed and embedded "
    "as identical literals in both engines. THE acceptance check a "
    "dedup pipeline runs before trusting its threshold: a shifted "
    "empirical curve means the band/row split is mis-tuned for the "
    "corpus's similarity distribution. Shape: one shingle pass feeds "
    "BOTH the pair universe and the signatures; candidates are the "
    "standard banded equi-join; the eval itself is one decile "
    "hash-aggregate.",
    tags=("dedup", "llm", "eval"),
)
def dedup_lsh_scurve_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    docs = spread(t(spark, sf_dir, "documents"))
    shingles = F.array_distinct(
        F.transform(
            TX.char_ngrams(F.col("text"), 5),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                "long"
            ),
        )
    )
    doc = docs.select(
        F.col("doc_id").alias("id"),
        "lang",
        F.round(F.col("n_chars"), -2).cast("bigint").alias("lb"),
        shingles.alias("shingles"),
    ).withColumn("sz", F.size("shingles"))
    doc = doc.localCheckpoint()  # one shingle pass feeds pairs AND sigs
    sh = doc.select(
        "id", "lang", "lb", "sz", F.explode("shingles").alias("h")
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.lb") == F.col("b.lb"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sza"),
            F.col("b.sz").alias("szb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    xr = doc.select("id", F.explode("shingles").alias("__h")).select(
        "id", (F.col("__h") % _MINHASH_P).alias("shingle_hash")
    )
    sigs = DD.minhash_signatures_from_hashes(xr, num_hashes=_SC_R * _SC_B)
    cand = (
        DD.lsh_band_pairs(sigs, num_hashes=_SC_R * _SC_B, bands=_SC_B)
        .select("id_a", "id_b")
        .withColumn("is_cand", F.lit(True))
    )
    jac = F.round(
        F.col("inter") * 1.0 / (F.col("sza") + F.col("szb") - F.col("inter")),
        6,
    )
    analytic = F.array(*[F.lit(v) for v in _SC_ANALYTIC])
    scored = pairs.join(cand, ["id_a", "id_b"], "left").select(
        F.least(F.floor(jac * 10), F.lit(9)).cast("bigint").alias("decile"),
        F.coalesce(F.col("is_cand"), F.lit(False)).alias("is_cand"),
    )
    return scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("is_cand"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_candidates"),
        F.round(
            F.sum(F.when(F.col("is_cand"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("empirical_rate"),
    ).select(
        "decile",
        "n_pairs",
        "n_candidates",
        "empirical_rate",
        F.element_at(analytic, (F.col("decile") + 1).cast("int")).alias(
            "analytic_rate"
        ),
    )
