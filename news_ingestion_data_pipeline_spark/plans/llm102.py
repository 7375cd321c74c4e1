"""Hundred-second wave: crawler operations — refetch scheduling and
robots.txt compliance audit.

Back to the reference's own domain (a news crawler): the reference
fetches every listing page every run with a fixed politeness delay
(`PhocusWire/PhocusWireSource.py` sleep(uniform(1,3))); a production
crawler instead SCHEDULES refetches from observed publish rates and
audits itself against robots rules.  Both are one-aggregate shapes:

  * pipeline_refetch_schedule — per stream: observed inter-arrival
    rate -> next-due timestamp -> overdue flag against the corpus
    watermark -> fetch priority (overdue first, fastest stream first).
    Exact integer microsecond arithmetic end to end.
  * pipeline_robots_compliance_audit — synthesize each source's
    disallow prefix and the crawl's fetched URLs (wave 89's generator),
    then a prefix-match audit: violations per source, rate, first
    offending path.  String ops inside WholeStageCodegen; one hash
    aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "pipeline_refetch_schedule",
    oracle="""
WITH per_stream AS (
  SELECT event_type AS stream,
         COUNT(*) AS n_seen,
         MIN(epoch_us(ts)) AS first_us,
         MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY event_type
), wm AS (SELECT MAX(epoch_us(ts)) AS now_us FROM events),
sched AS (
  SELECT stream, n_seen, last_us,
         (last_us - first_us) // (n_seen - 1) AS gap_us
  FROM per_stream WHERE n_seen >= 2
)
SELECT stream,
       CAST(n_seen AS BIGINT) AS n_seen,
       strftime(to_timestamp(last_us // 1000000), '%Y-%m-%d %H:%M:%S')
         AS last_seen,
       CAST(gap_us // 1000000 AS BIGINT) AS avg_gap_sec,
       (last_us + gap_us < (SELECT now_us FROM wm)) AS overdue,
       CAST(ROW_NUMBER() OVER (
         ORDER BY (last_us + gap_us < (SELECT now_us FROM wm)) DESC,
                  gap_us, stream) AS BIGINT) AS fetch_rank
FROM sched
ORDER BY fetch_rank
""",
    description="Adaptive refetch scheduling — what replaces the "
    "reference's fixed fetch-everything-every-run loop at scale: per "
    "stream, the observed mean inter-arrival gap (exact integer "
    "microsecond division over (first, last, count) — no per-event "
    "state) gives a next-due time; streams whose next-due has passed "
    "the corpus watermark are overdue; the fetch queue ranks overdue "
    "first, fastest-moving first, name tiebreak. One hash aggregate "
    "plus a broadcast watermark scalar — the crawl frontier for a "
    "million sources costs one pass over arrivals, and the rank is "
    "over the (small) stream dimension, not events.",
    tags=("pipeline", "events"),
)
def pipeline_refetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    per_stream = e.groupBy(F.col("event_type").alias("stream")).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )
    wm = e.agg(F.max("us").alias("now_us"))
    sched = (
        per_stream.filter(F.col("n_seen") >= 2)
        .withColumn(
            "gap_us",
            F.expr("(last_us - first_us) DIV (n_seen - 1)"),
        )
        .crossJoin(F.broadcast(wm))
    )
    overdue = F.col("last_us") + F.col("gap_us") < F.col("now_us")
    return (
        sched.select(
            "stream",
            F.col("n_seen").cast("bigint").alias("n_seen"),
            F.date_format(
                F.timestamp_seconds(F.expr("last_us DIV 1000000")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("last_seen"),
            F.expr("CAST(gap_us DIV 1000000 AS BIGINT)").alias("avg_gap_sec"),
            overdue.alias("overdue"),
            F.row_number()
            .over(
                Window.orderBy(
                    overdue.desc(), F.col("gap_us"), F.col("stream")
                )
            )
            .cast("bigint")
            .alias("fetch_rank"),
        )
        
    )


#: wave-89's deterministic raw-URL synthesis, path part only
_PATH_SQL = """
  '/docs/' || CAST(doc_id % 50 AS VARCHAR)
  || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
"""


@register(
    "pipeline_robots_compliance_audit",
    oracle=f"""
WITH urls AS (
  SELECT doc_id, source, {_PATH_SQL} AS path FROM documents
), rules AS (
  SELECT DISTINCT source,
         '/docs/' || CAST(CAST(substr(source, 4) AS INT) % 5 AS VARCHAR)
           AS disallow_prefix
  FROM documents
), audited AS (
  SELECT u.source, u.path, r.disallow_prefix,
         starts_with(u.path, r.disallow_prefix) AS violation
  FROM urls u JOIN rules r ON u.source = r.source
)
SELECT source,
       MAX(disallow_prefix) AS disallow_prefix,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN violation THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       round(SUM(CASE WHEN violation THEN 1 ELSE 0 END) * 100.0 / COUNT(*),
             4) AS violation_pct,
       MIN(CASE WHEN violation THEN path END) AS first_offending_path
FROM audited
GROUP BY source
ORDER BY source
""",
    description="robots.txt compliance audit — the self-check a polite "
    "crawler runs over its own fetch log (the reference sleeps between "
    "fetches but never checks disallow rules): each source's disallow "
    "prefix is synthesized deterministically (source number mod 5 "
    "under /docs/), the crawl's fetched paths come from wave 89's URL "
    "generator, and a prefix match flags violations — per-source "
    "counts, rate, and the first offending path. Note the prefix "
    "semantics are real robots semantics: '/docs/4' also matches "
    "/docs/40..49, exactly like a robots.txt path prefix. Pure string "
    "map + one hash aggregate; the rules table is dimension-sized and "
    "broadcast at 100 TB.",
    tags=("pipeline", "scan"),
)
def pipeline_robots_compliance_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    path = F.concat(
        F.lit("/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    urls = d.select("source", path.alias("path"))
    rules = (
        d.select("source")
        .distinct()
        .withColumn(
            "disallow_prefix",
            F.concat(
                F.lit("/docs/"),
                (F.substring("source", 4, 10).cast("int") % 5).cast("string"),
            ),
        )
    )
    audited = urls.join(F.broadcast(rules), "source").withColumn(
        "violation", F.col("path").startswith(F.col("disallow_prefix"))
    )
    return (
        audited.groupBy("source")
        .agg(
            F.max("disallow_prefix").alias("disallow_prefix"),
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.sum(F.col("violation").cast("bigint"))
            .cast("bigint")
            .alias("n_violations"),
            F.round(
                F.sum(F.col("violation").cast("bigint"))
                * 100.0
                / F.count(F.lit(1)),
                4,
            ).alias("violation_pct"),
            F.min(F.when(F.col("violation"), F.col("path"))).alias(
                "first_offending_path"
            ),
        )
        
    )
