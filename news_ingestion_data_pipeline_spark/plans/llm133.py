"""Hundred-thirty-third wave: interval union and business-day
arithmetic.

  * events_interval_union — the interval-merge primitive: every error
    event opens a 5-minute outage window; overlapping/touching windows
    per user merge into maximal outage intervals (running-max-of-ends
    marks island starts — the sweep-line rewrite), yielding per-user
    outage count, total downtime, and longest outage.  The SLA /
    uptime accounting every ops dashboard needs and naive DISTINCT
    can't express.
  * scalar_business_days — closed-form business-day distance (Mon-Fri)
    between order date and each lineitem's ship date: full weeks
    contribute 5, the remainder is corrected by weekday positions —
    pure integer arithmetic, no calendar loop, bit-identical across
    engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_OUT_US = 300_000_000  # 5-minute outage per error event


@register(
    "events_interval_union",
    oracle=f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + {_OUT_US} AS e
  FROM events WHERE event_type = 'error'
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS is_new
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM marked
),
merged AS (
  SELECT user_id, island, MIN(s) AS m_start, MAX(e) AS m_end
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_outages,
       CAST(SUM(m_end - m_start) // 1000000 AS BIGINT) AS downtime_sec,
       CAST(MAX(m_end - m_start) // 1000000 AS BIGINT) AS longest_sec
FROM merged
GROUP BY user_id
ORDER BY user_id
""",
    description="Interval union (sweep-line merge): each error event "
    "opens a 5-minute outage window; per user, windows that overlap or "
    "touch merge into maximal intervals via the running-max-of-ends "
    "island rewrite (an interval starts an island iff its start exceeds "
    "every previous end). Emits outage count, total downtime and longest "
    "outage — SLA arithmetic where double-counting overlaps is the "
    "classic bug. All integer microseconds. One (user) shuffle shared by "
    "both windows and the final rollup; the sweep needs sorted-within-"
    "user order, which the window sort provides — no driver-side "
    "interval stitching.",
    tags=("events", "window", "interval"),
)
def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp))").alias("s"),
            (
                F.expr("unix_micros(cast(ts as timestamp))") + _OUT_US
            ).alias("e"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "s",
        "e",
        F.when(F.col("s") > F.coalesce(prev_max_end, F.lit(-1)), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    islands = marked.withColumn(
        "island",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("m_start"), F.max("e").alias("m_end")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_outages"),
            F.expr(
                "CAST(SUM(m_end - m_start) div 1000000 AS BIGINT)"
            ).alias("downtime_sec"),
            F.expr(
                "CAST(MAX(m_end - m_start) div 1000000 AS BIGINT)"
            ).alias("longest_sec"),
        )
        
    )


@register(
    "scalar_business_days",
    oracle="""
WITH pairs AS (
  SELECT l.l_orderkey, l.l_linenumber,
         epoch(o.o_orderdate)::BIGINT // 86400 AS d0,
         epoch(l.l_shipdate)::BIGINT // 86400 AS d1
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
calc AS (
  SELECT l_orderkey, l_linenumber, d0, d1,
         (d0 + 3) % 7 AS w0,            -- 0=Mon ... 6=Sun (epoch day 0 = Thu)
         GREATEST(d1 - d0, 0) AS span
  FROM pairs
)
SELECT l_orderkey, l_linenumber,
       CAST(span AS BIGINT) AS calendar_days,
       CAST((span // 7) * 5 +
            len(list_filter(range(1, span % 7 + 1),
                            k -> (w0 + k) % 7 < 5)) AS BIGINT)
         AS business_days
FROM calc
ORDER BY l_orderkey, l_linenumber
""",
    description="Business-day (Mon-Fri) shipping latency per lineitem: "
    "full weeks contribute exactly 5 weekdays, and the remainder (< 7 "
    "days) is counted by weekday position — expressed as a bounded "
    "list-comprehension over at most 6 offsets so both engines evaluate "
    "the identical integer predicate chain. Weekday derives from epoch day arithmetic ((d+4) "
    "mod 7, day 0 = Thursday) — no calendar UDF, no locale. The "
    "date-dimension-free way to do working-day SLAs at 100 TB. "
    "Backdated ships (present in the synthetic data) clamp to zero lag.",
    tags=("scalar", "datetime", "join"),
)
def scalar_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
        ).alias("d1"),
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("d0"),
    )
    calc = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("d0") + 3) % 7).alias("w0"),
        # synthetic data has ship-before-order rows: clamp to zero lag
        F.greatest(F.col("d1") - F.col("d0"), F.lit(0)).alias("span"),
    )
    # Spark's sequence(1, 0) DESCENDS instead of returning empty — guard
    # the zero-remainder case explicitly (DuckDB's range(1, 1) is empty).
    rem = F.col("span") % 7
    rem_days = F.when(rem >= 1, F.size(
        F.filter(
            F.sequence(F.lit(1), rem),
            lambda k: (F.col("w0") + k) % 7 < 5,
        )
    )).otherwise(F.lit(0))
    return calc.select(
        "l_orderkey",
        "l_linenumber",
        F.col("span").cast("bigint").alias("calendar_days"),
        (
            F.expr("(span div 7) * 5") + rem_days
        ).cast("bigint").alias("business_days"),
    )
