"""Eighty-third wave: out-of-orderness profiling and the revenue bridge.

events_out_of_order_profile measures how late data actually arrives
(arrival order = event_id, event time = ts) — the number that DECIDES the
streaming watermark delay (streaming/windows.py hardcodes '10 minutes';
this query is how you justify or revise it).
orders_revenue_bridge is the FP&A classic: year-over-year revenue change
decomposed into volume, per-order-value, and mix effects per priority
class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_OOO_PCTS = [0.5, 0.95, 0.99]


@register(
    "events_out_of_order_profile",
    oracle=f"""
WITH arr AS (
  SELECT event_id, epoch_us(ts) AS us,
         MAX(epoch_us(ts)) OVER (ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_seen
  FROM events
), late AS (
  SELECT event_id,
         CASE WHEN max_seen IS NULL OR us >= max_seen THEN 0
              ELSE max_seen - us END AS lateness_us
  FROM arr
), ranked AS (
  SELECT lateness_us,
         ROW_NUMBER() OVER (ORDER BY lateness_us, event_id) AS rn,
         COUNT(*) OVER () AS n
  FROM late
), grid AS (SELECT UNNEST([{", ".join(f"CAST({p!r} AS DOUBLE)" for p in _OOO_PCTS)}]) AS p)
SELECT g.p,
       CAST(MAX(r.n) AS BIGINT) AS n_events,
       round(CAST((SELECT COUNT(*) FROM late WHERE lateness_us > 0) AS DOUBLE)
             / MAX(r.n), 6) AS frac_out_of_order,
       round(CAST(MAX(CASE WHEN r.rn = CAST(ceil(g.p * r.n) AS BIGINT)
                           THEN r.lateness_us END) AS DOUBLE) / 60000000.0, 6)
         AS lateness_minutes
FROM grid g CROSS JOIN ranked r
GROUP BY g.p
ORDER BY g.p
""",
    description="Out-of-orderness profile of the event stream: treating "
    "event_id as ARRIVAL order and ts as EVENT time, each event's "
    "lateness is how far behind the running max-seen event time it "
    "arrives, summarized as the out-of-order fraction and exact "
    "p50/p95/p99 lateness in minutes — the measurement that DECIDES a "
    "streaming watermark delay (the streaming suite's "
    "withWatermark('10 minutes') bounds state by dropping anything "
    "later; this query says what that choice actually drops, the "
    "p99-vs-watermark gap). The running max runs as the two-pass "
    "bucketed prefix max (operators/ranking.py: event_id-range buckets, "
    "broadcast offsets, in-bucket windows PARTITIONED by bucket); the "
    "lateness percentiles come from the distinct-value histogram's "
    "distributed cumulative counts (k-th order statistic = min{v : "
    "cum(v) >= k}) — no single-partition window, no per-row rank. "
    "Integer microseconds throughout.",
    tags=("events", "streaming", "monitoring", "timeseries"),
)
def events_out_of_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both order-dependent stages run the two-pass bucketed decomposition
    # (operators/ranking.py) — no single-partition window at any SF:
    # (a) the arrival-order running max buckets on event_id ranges
    # (per-bucket max → broadcast prefix offsets → in-bucket window
    # PARTITIONED by bucket); (b) the lateness percentiles come from the
    # distinct-lateness histogram's distributed cumulative counts — the
    # k-th order statistic is min{v : cum(v) >= k}, so ranks never
    # materialize per row (and the zero-heavy lateness skew collapses
    # into ONE histogram row instead of one giant bucket).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = t(spark, sf_dir, "events").select("event_id", us.alias("us"))
    eenv = ev.agg(F.min("event_id").alias("elo"), F.max("event_id").alias("ehi"))
    late = (
        RK.distributed_prefix_max(
            ev.crossJoin(F.broadcast(eenv)),
            ["event_id"],
            RK.range_bucket(F.col("event_id"), F.col("elo"), F.col("ehi")),
            "us",
            out="max_seen",
            inclusive=False,
        )
        .select(
            "event_id",
            F.when(
                F.col("max_seen").isNull() | (F.col("us") >= F.col("max_seen")), 0
            )
            .otherwise(F.col("max_seen") - F.col("us"))
            .alias("lateness_us"),
        )
        .localCheckpoint()
    )
    lenv = late.agg(
        F.min("lateness_us").alias("llo"),
        F.max("lateness_us").alias("lhi"),
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("lateness_us") > 0, 1)).alias("n_ooo"),
    )
    hist = late.groupBy("lateness_us").agg(F.count(F.lit(1)).alias("cnt"))
    cum = RK.distributed_prefix_sum(
        hist.crossJoin(F.broadcast(lenv)),
        ["lateness_us"],
        RK.range_bucket(F.col("lateness_us"), F.col("llo"), F.col("lhi")),
        ["cnt"],
        inclusive=True,
    )
    grid = late.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _OOO_PCTS])).alias("p")
    )
    return (
        cum.crossJoin(F.broadcast(grid))
        .filter(
            F.col("cum_cnt") >= F.ceil(F.col("p") * F.col("n")).cast("bigint")
        )
        .groupBy("p")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.max("n_ooo").alias("n_ooo"),
            F.min("lateness_us").alias("lat_us"),
        )
        .select(
            "p",
            "n_events",
            F.round(
                F.col("n_ooo").cast("double") / F.col("n_events"), 6
            ).alias("frac_out_of_order"),
            F.round(F.col("lat_us").cast("double") / 60_000_000.0, 6).alias(
                "lateness_minutes"
            ),
        )
    )


@register(
    "orders_revenue_bridge",
    oracle="""
WITH yearly AS (
  SELECT o_orderpriority AS prio, year(o_orderdate) AS yr,
         COUNT(*) AS vol,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY o_orderpriority, year(o_orderdate)
), paired AS (
  SELECT COALESCE(a.prio, b.prio) AS prio,
         COALESCE(a.vol, 0) AS v0, COALESCE(b.vol, 0) AS v1,
         CAST(CAST(COALESCE(a.rev, 0) AS VARCHAR) AS DOUBLE) AS r0,
         CAST(CAST(COALESCE(b.rev, 0) AS VARCHAR) AS DOUBLE) AS r1
  FROM (SELECT * FROM yearly WHERE yr = 1995) a
  FULL OUTER JOIN (SELECT * FROM yearly WHERE yr = 1996) b ON b.prio = a.prio
)
SELECT prio,
       CAST(v0 AS BIGINT) AS orders_1995,
       CAST(v1 AS BIGINT) AS orders_1996,
       round(r1 - r0, 6) AS revenue_change,
       round((v1 - v0) * (r0 / v0), 6) AS volume_effect,
       round(v0 * (r1 / v1 - r0 / v0), 6) AS value_effect,
       round((v1 - v0) * (r1 / v1 - r0 / v0), 6) AS mix_effect
FROM paired
WHERE v0 > 0 AND v1 > 0
ORDER BY prio
""",
    description="The revenue bridge (price-volume-mix decomposition) per "
    "priority class, 1995 → 1996: ΔR = (Δvolume)·AOV₀ + "
    "volume₀·(ΔAOV) + Δvolume·ΔAOV — the exact additive identity "
    "(asserted by tests) that FP&A waterfalls are built from, "
    "answering 'did revenue move because we sold MORE orders or "
    "BIGGER orders' per segment — the explanation layer on top of "
    "orders_mom_growth's raw deltas. Revenue totals are exact "
    "DECIMAL; the three effects are one deterministic IEEE expression "
    "per 5-row segment. Shape: one two-year aggregate, one tiny "
    "full-outer self-pair on priority.",
    tags=("orders", "agg", "finance"),
)
def orders_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    yearly = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("vol"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    a = yearly.filter(F.col("yr") == 1995).select(
        F.col("prio").alias("pa"), F.col("vol").alias("v0"), F.col("rev").alias("rev0")
    )
    b = yearly.filter(F.col("yr") == 1996).select(
        F.col("prio").alias("pb"), F.col("vol").alias("v1"), F.col("rev").alias("rev1")
    )
    paired = a.join(b, F.col("pa") == F.col("pb"), "full_outer").select(
        F.coalesce(F.col("pa"), F.col("pb")).alias("prio"),
        F.coalesce(F.col("v0"), F.lit(0)).alias("v0"),
        F.coalesce(F.col("v1"), F.lit(0)).alias("v1"),
        F.coalesce(F.col("rev0"), F.lit(0)).cast("double").alias("r0"),
        F.coalesce(F.col("rev1"), F.lit(0)).cast("double").alias("r1"),
    )
    aov0 = F.col("r0") / F.col("v0")
    aov1 = F.col("r1") / F.col("v1")
    return (
        paired.filter((F.col("v0") > 0) & (F.col("v1") > 0))
        .select(
            "prio",
            F.col("v0").cast("bigint").alias("orders_1995"),
            F.col("v1").cast("bigint").alias("orders_1996"),
            F.round(F.col("r1") - F.col("r0"), 6).alias("revenue_change"),
            F.round((F.col("v1") - F.col("v0")) * aov0, 6).alias("volume_effect"),
            F.round(F.col("v0") * (aov1 - aov0), 6).alias("value_effect"),
            F.round((F.col("v1") - F.col("v0")) * (aov1 - aov0), 6).alias(
                "mix_effect"
            ),
        )
        
    )
