"""Thirty-second wave: time-constrained sequence matching (a funnel
whose every step has a deadline — CEP with windows, not just order) and
Kaplan-Meier survival estimation over inter-order gaps with censoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_W1_US = 30 * 60 * 1_000_000  # view -> click deadline (30 min)
_W2_US = 60 * 60 * 1_000_000  # click -> purchase deadline (60 min)


@register(
    "events_funnel_windowed",
    oracle=f"""
WITH fv AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), fc AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
  FROM events e JOIN fv ON fv.user_id = e.user_id
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > fv.t_view
    AND epoch_us(e.ts) <= fv.t_view + {_W1_US}
  GROUP BY e.user_id
), fp AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_buy
  FROM events e JOIN fc ON fc.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > fc.t_click
    AND epoch_us(e.ts) <= fc.t_click + {_W2_US}
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM fv) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM fc) AS BIGINT) AS n_clicked_in_window,
       CAST((SELECT COUNT(*) FROM fp) AS BIGINT) AS n_purchased_in_window,
       round(CAST((SELECT COUNT(*) FROM fc) AS DOUBLE)
             / (SELECT COUNT(*) FROM fv), 6) AS view_to_click_rate,
       round(CAST((SELECT COUNT(*) FROM fp) AS DOUBLE)
             / (SELECT COUNT(*) FROM fv), 6) AS full_funnel_rate
""",
    description="Deadline-constrained funnel (CEP with per-step windows, "
    "not just event order): first view, then the first click within 30 "
    "MINUTES of that view, then the first purchase within 60 minutes of "
    "that click — each step anchored to the previous step's timestamp, "
    "which plain order-based funnels (events_funnel_conversion, regex "
    "sequence mining) cannot express. Each stage is one hash aggregate "
    "(MIN epoch per user) joined back user-to-user — the decomposed "
    "form of MATCH_RECOGNIZE's PATTERN (A B C) WITHIN semantics that "
    "runs as three shuffles on user_id, each strictly shrinking. "
    "Microsecond integer comparisons everywhere; ratios are single "
    "deterministic divisions of exact counts.",
    tags=("events", "funnel", "cep"),
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_micros(cast(ts as timestamp))").alias("tus")
    )
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t_view"))
    )
    fc = (
        ev.where(F.col("event_type") == "click")
        .join(fv, "user_id")
        .where(
            (F.col("tus") > F.col("t_view"))
            & (F.col("tus") <= F.col("t_view") + _W1_US)
        )
        .groupBy("user_id")
        .agg(F.min("tus").alias("t_click"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .where(
            (F.col("tus") > F.col("t_click"))
            & (F.col("tus") <= F.col("t_click") + _W2_US)
        )
        .groupBy("user_id")
        .agg(F.min("tus").alias("t_buy"))
    )
    nv = fv.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewed"))
    nc = fc.agg(F.count(F.lit(1)).cast("bigint").alias("n_clicked_in_window"))
    np_ = fp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchased_in_window")
    )
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_viewed",
            "n_clicked_in_window",
            "n_purchased_in_window",
            F.round(
                F.col("n_clicked_in_window").cast("double") / F.col("n_viewed"),
                6,
            ).alias("view_to_click_rate"),
            F.round(
                F.col("n_purchased_in_window").cast("double")
                / F.col("n_viewed"),
                6,
            ).alias("full_funnel_rate"),
        )
    )


@register(
    "customer_survival_km",
    oracle="""
WITH seq AS (
  SELECT o_custkey, o_orderdate,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM orders
), horizon AS (
  SELECT MAX(o_orderdate) AS h FROM orders
), obs AS (
  SELECT CAST(date_diff('day', o_orderdate, nxt) AS BIGINT) AS gap,
         1 AS observed
  FROM seq WHERE nxt IS NOT NULL
  UNION ALL
  SELECT CAST(date_diff('day', o_orderdate, h) AS BIGINT) AS gap,
         0 AS observed
  FROM seq, horizon WHERE nxt IS NULL
), times AS (
  SELECT gap AS t_days,
         SUM(observed) AS d
  FROM obs WHERE observed = 1 GROUP BY gap
), at_risk AS (
  SELECT t.t_days, t.d,
         (SELECT COUNT(*) FROM obs o WHERE o.gap >= t.t_days) AS n
  FROM times t
)
SELECT CAST(t_days AS INT) AS t_days,
       CAST(n AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events,
       -- a factor of exactly 0 (d = n, everyone at risk converts)
       -- absorbs: survival is 0 from that point on, kept out of ln()
       CASE WHEN MAX(CASE WHEN d >= n THEN 1 ELSE 0 END)
                 OVER (ORDER BY t_days) = 1
            THEN 0.0
            ELSE round(exp(SUM(CASE WHEN d < n
                                    THEN ln(1.0 - CAST(d AS DOUBLE) / n)
                                    ELSE 0.0 END)
                           OVER (ORDER BY t_days)), 6) END AS survival
FROM at_risk
ORDER BY t_days
""",
    description="Kaplan-Meier survival curve of customer inter-order "
    "gaps with right-censoring: each consecutive-order gap is an "
    "observed repurchase event; each customer's open-ended tail (last "
    "order to the corpus horizon) enters as a CENSORED observation that "
    "keeps contributing to the at-risk denominator without counting as "
    "an event — dropping censored tails (the classic churn-analysis "
    "mistake) biases survival low. S(t) = prod over event times <= t "
    "of (1 - d_i/n_i), computed as exp of a cumulative log-sum over the "
    "event-time axis (hundreds of points, one tiny window; both engines "
    "evaluate the identical double sequence). The at-risk counts come "
    "from a gap-vs-time >= comparison on the aggregated gap histogram — "
    "at 100 TB that is a suffix-sum over the day-granular histogram, "
    "never a rescan of raw orders.",
    tags=("events", "stats", "timeseries"),
)
def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.withColumn("nxt", F.lead("o_orderdate").over(w))
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    observed = seq.where(F.col("nxt").isNotNull()).select(
        F.datediff("nxt", "o_orderdate").cast("bigint").alias("gap"),
        F.lit(1).alias("observed"),
    )
    censored = (
        seq.where(F.col("nxt").isNull())
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("h", "o_orderdate").cast("bigint").alias("gap"),
            F.lit(0).alias("observed"),
        )
    )
    obs = observed.unionByName(censored)
    times = (
        obs.where(F.col("observed") == 1)
        .groupBy(F.col("gap").alias("t_days"))
        .agg(F.sum("observed").alias("d"))
    )
    # at-risk via suffix sum over the gap histogram (no raw rescan)
    hist = obs.groupBy("gap").agg(F.count(F.lit(1)).alias("cnt"))
    n_at = hist.select(
        F.col("gap"),
        F.sum("cnt")
        .over(Window.orderBy(F.desc("gap")).rowsBetween(Window.unboundedPreceding, 0))
        .alias("n"),
    )
    at_risk = times.join(n_at, times["t_days"] == n_at["gap"]).select(
        "t_days", "d", "n"
    )
    wt = Window.orderBy("t_days")
    zero_seen = F.max(
        F.when(F.col("d") >= F.col("n"), 1).otherwise(0)
    ).over(wt)
    s_log = F.sum(
        F.when(
            F.col("d") < F.col("n"),
            F.log(1.0 - F.col("d").cast("double") / F.col("n")),
        ).otherwise(F.lit(0.0))
    ).over(wt)
    surv = F.when(zero_seen == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(s_log), 6)
    )
    return (
        at_risk.select(
            F.col("t_days").cast("int").alias("t_days"),
            F.col("n").cast("bigint").alias("n_at_risk"),
            F.col("d").cast("bigint").alias("n_events"),
            surv.alias("survival"),
        )
        
    )
