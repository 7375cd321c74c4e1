"""Hundred-fifty-third wave: source-freshness SLA alerting.

  * pipeline_source_freshness_alert — the on-call dashboard's first
    panel: per source, the watermark (max ingested doc ordering key,
    standing in for event time on this corpus), its lag behind the
    freshest source, doc volume, and the SLA flag for sources lagging
    more than the threshold.  pipeline_watermark_per_source reports
    the raw watermarks; this is the judgment layer on top — lag is
    measured against the OBSERVED frontier, not wall clock, so the
    alert works identically in backfills and replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_SLA_LAG = 40  # doc-id units behind the frontier before alerting


@register(
    "pipeline_source_freshness_alert",
    oracle=f"""
WITH per_source AS (
  SELECT source,
         MAX(doc_id) AS watermark,
         COUNT(*) AS n_docs
  FROM documents GROUP BY source
),
frontier AS (SELECT MAX(watermark) AS f FROM per_source)
SELECT p.source,
       CAST(p.watermark AS BIGINT) AS watermark,
       CAST(p.n_docs AS BIGINT) AS n_docs,
       CAST(fr.f - p.watermark AS BIGINT) AS lag_behind_frontier,
       CAST(fr.f - p.watermark > {_SLA_LAG} AS BOOLEAN) AS sla_breached
FROM per_source p CROSS JOIN frontier fr
ORDER BY source
""",
    description="Source-freshness SLA alerting: per source the watermark "
    "(max ingested ordering key), its lag behind the OBSERVED frontier "
    f"(the freshest source), and the alert flag at lag > {_SLA_LAG} — "
    "measuring against the frontier instead of wall clock means the "
    "panel stays correct during backfills and replays, where "
    "now()-based freshness pages for no reason. The judgment layer on "
    "pipeline_watermark_per_source's raw watermarks; the reference's "
    "incremental loop (SURVEY §2.9) is exactly what this monitors in "
    "production. One grouped pass + a 1-row frontier broadcast.",
    tags=("pipeline", "quality"),
)
def pipeline_source_freshness_alert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    per_source = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.max("doc_id").alias("watermark"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    frontier = per_source.agg(F.max("watermark").alias("f"))
    return (
        per_source.crossJoin(F.broadcast(frontier))
        .select(
            "source",
            F.col("watermark").cast("bigint").alias("watermark"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            (F.col("f") - F.col("watermark")).cast("bigint").alias(
                "lag_behind_frontier"
            ),
            (F.col("f") - F.col("watermark") > _SLA_LAG).alias(
                "sla_breached"
            ),
        )
        
    )
