"""Eighty-eighth wave: chance-corrected classification agreement.

agg_cohens_kappa scores the heuristic language identifier against the
gold labels with Cohen's kappa — accuracy corrected for chance
agreement, the statistic that keeps a 90%-majority-class classifier
from looking good (text_langid_confusion shows WHERE the errors are;
kappa says whether the classifier beats guessing at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t


def _kappa_oracle() -> str:
    langid = REGISTRY["text_lang_id"].oracle
    return f"""
WITH pred AS (SELECT actual_lang, pred_lang FROM ({langid})),
n AS (SELECT COUNT(*) AS n FROM pred),
po AS (
  SELECT CAST(COUNT(*) FILTER (WHERE actual_lang = pred_lang) AS DOUBLE)
           / MAX(n.n) AS po
  FROM pred CROSS JOIN n
), marg AS (
  SELECT a.actual_lang AS cls,
         CAST(a.ca AS DOUBLE) * p.cp AS prod
  FROM (SELECT actual_lang, COUNT(*) AS ca FROM pred GROUP BY actual_lang) a
  JOIN (SELECT pred_lang, COUNT(*) AS cp FROM pred GROUP BY pred_lang) p
    ON p.pred_lang = a.actual_lang
), pe AS (
  SELECT SUM(prod) / (MAX(n.n) * CAST(MAX(n.n) AS DOUBLE)) AS pe
  FROM marg CROSS JOIN n
)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_docs,
       round(po.po, 6) AS observed_agreement,
       round(pe.pe, 6) AS chance_agreement,
       round((po.po - pe.pe) / (1.0 - pe.pe), 6) AS cohens_kappa
FROM po CROSS JOIN pe
"""


@register(
    "agg_cohens_kappa",
    oracle=_kappa_oracle(),
    description="Cohen's kappa of the heuristic language identifier "
    "(text_lang_id's registered construction, reused) against the gold "
    "lang labels: κ = (p_o − p_e)/(1 − p_e), where p_e is the chance "
    "agreement implied by the two marginal distributions — the "
    "correction that keeps a majority-class guesser from scoring high "
    "(raw accuracy on a 90%-one-language corpus is 90% for free; its "
    "kappa is 0). Classes absent from either marginal contribute zero "
    "to p_e via the inner marginal join. All counts are exact "
    "integers; kappa is one IEEE expression over three 1-row frames. "
    "Shape: the classifier pass is the only corpus-sized work; "
    "agreement needs one conditional count and two tiny marginal "
    "aggregates.",
    tags=("agg", "stats", "text", "eval"),
)
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = REGISTRY["text_lang_id"].fn(spark, sf_dir).select(
        "actual_lang", "pred_lang"
    )
    n = pred.agg(F.count(F.lit(1)).alias("n"))
    po = pred.crossJoin(F.broadcast(n)).agg(
        (
            F.count(F.when(F.col("actual_lang") == F.col("pred_lang"), 1)).cast(
                "double"
            )
            / F.max("n")
        ).alias("po")
    )
    ca = pred.groupBy("actual_lang").agg(F.count(F.lit(1)).alias("ca"))
    cp = pred.groupBy("pred_lang").agg(F.count(F.lit(1)).alias("cp"))
    pe = (
        ca.join(F.broadcast(cp), ca["actual_lang"] == cp["pred_lang"])
        .crossJoin(F.broadcast(n))
        .agg(
            (
                F.sum(F.col("ca").cast("double") * F.col("cp"))
                / (F.max("n") * F.max("n").cast("double"))
            ).alias("pe")
        )
    )
    return (
        po.crossJoin(F.broadcast(pe))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n").cast("bigint").alias("n_docs"),
            F.round("po", 6).alias("observed_agreement"),
            F.round("pe", 6).alias("chance_agreement"),
            F.round(
                (F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe")), 6
            ).alias("cohens_kappa"),
        )
    )
