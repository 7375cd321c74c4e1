"""Hundred-fifteenth wave: weight-of-evidence feature scoring and
Kleinberg burst detection.

  * feature_woe_iv — the credit-scoring feature diagnostic: bin the
    order value into fixed 100k bands, compute each band's
    weight-of-evidence ln(good_share/bad_share) against the urgent-
    priority target (Laplace-smoothed), and the feature's total
    information value.  The categorical-feature power meter that runs
    before any model training.
  * events_kleinberg_bursts — Kleinberg's two-state burst automaton
    over per-type inter-arrival gaps: forward Viterbi costs for the
    base-rate and 2x-rate states with a ln(n) transition toll, burst
    steps counted where the burst state is cheaper.  The principled
    upgrade of threshold-based spike detection, run under the
    cross-engine fold contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_BIN_W = 100000


@register(
    "feature_woe_iv",
    oracle=f"""
WITH binned AS (
  SELECT LEAST(CAST(floor(o_totalprice) AS BIGINT) // {_BIN_W}, 4) AS bin,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS bad
  FROM orders
),
cells AS (
  SELECT bin,
         SUM(1 - bad) AS n_good,
         SUM(bad) AS n_bad
  FROM binned GROUP BY bin
),
tot AS (
  SELECT SUM(n_good) AS g_tot, SUM(n_bad) AS b_tot,
         COUNT(*) AS n_bins
  FROM cells
),
scored AS (
  SELECT c.bin,
         CAST(c.n_good AS BIGINT) AS n_good,
         CAST(c.n_bad AS BIGINT) AS n_bad,
         CAST(round(ln(((c.n_good + 0.5) / (t.g_tot + 0.5 * t.n_bins))
                       / ((c.n_bad + 0.5) / (t.b_tot + 0.5 * t.n_bins))), 9)
              AS DECIMAL(18,9)) AS woe9,
         CAST(round((c.n_good + 0.5) / (t.g_tot + 0.5 * t.n_bins)
                    - (c.n_bad + 0.5) / (t.b_tot + 0.5 * t.n_bins), 9)
              AS DECIMAL(18,9)) AS share_gap9
  FROM cells c CROSS JOIN tot t
)
SELECT bin, n_good, n_bad,
       CAST(CAST(woe9 AS VARCHAR) AS DOUBLE) AS woe,
       CAST(CAST(
         (SELECT SUM(s2.share_gap9 * s2.woe9) FROM scored s2)
         AS VARCHAR) AS DOUBLE) AS iv_total
FROM scored
ORDER BY bin
""",
    description="Weight-of-evidence / information-value feature scoring: "
    "order value binned into 100k bands (top band open), per-band WOE = "
    "ln(good_share/bad_share) against the urgent-priority target with "
    "0.5-Laplace smoothing, and the feature's total IV = sum over bands "
    "of (good_share - bad_share) * WOE replicated per row. The classic "
    "pre-model feature-power diagnostic. Determinism: ln and the share "
    "gap are evaluated once per BAND (bounded set), rounded to 9 dp, and "
    "the IV sum folds through exact DECIMAL products, so the report is "
    "bit-identical across engines and partition orders. One map-side "
    "counting pass + a band-count reduce — nothing corpus-sized shuffles.",
    tags=("feature", "stats"),
)
def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    binned = t(spark, sf_dir, "orders").select(
        F.least(
            F.expr(f"CAST(floor(o_totalprice) AS BIGINT) div {_BIN_W}"), F.lit(4)
        ).alias("bin"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("bad"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum(1 - F.col("bad")).alias("n_good"),
        F.sum("bad").alias("n_bad"),
    )
    tot = cells.agg(
        F.sum("n_good").alias("g_tot"),
        F.sum("n_bad").alias("b_tot"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    g_share = (F.col("n_good") + 0.5) / (
        F.col("g_tot") + 0.5 * F.col("n_bins")
    )
    b_share = (F.col("n_bad") + 0.5) / (
        F.col("b_tot") + 0.5 * F.col("n_bins")
    )
    scored = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("n_good").cast("bigint").alias("n_good"),
        F.col("n_bad").cast("bigint").alias("n_bad"),
        F.round(F.log(g_share / b_share), 9)
        .cast("decimal(18,9)")
        .alias("woe9"),
        F.round(g_share - b_share, 9).cast("decimal(18,9)").alias(
            "share_gap9"
        ),
    )
    iv = scored.agg(
        F.sum(F.col("share_gap9") * F.col("woe9")).alias("iv9")
    )
    return (
        scored.crossJoin(F.broadcast(iv))
        .select(
            "bin",
            "n_good",
            "n_bad",
            F.col("woe9").cast("double").alias("woe"),
            F.col("iv9").cast("double").alias("iv_total"),
        )
        
    )


_S = "2.0"  # burst-state rate multiplier
_GAMMA = "1.0"  # transition-cost coefficient


@register(
    "events_kleinberg_bursts",
    oracle=f"""
WITH ordered AS (
  SELECT event_type,
         list(epoch_us(ts) ORDER BY ts, event_id) AS us
  FROM events GROUP BY event_type
),
gaps AS (
  SELECT event_type,
         list_transform(
           list_zip(us[2:len(us)], us[1:len(us)-1]),
           z -> (z[1] - z[2]) / 1000000.0
         ) AS xs,
         len(us) - 1 AS n_gaps,
         (us[len(us)] - us[1]) / 1000000.0 AS span_sec
  FROM ordered WHERE len(us) >= 2
),
rates AS (
  SELECT event_type, xs, n_gaps,
         n_gaps / span_sec AS lam0,
         {_S} * (n_gaps / span_sec) AS lam1,
         round(ln(n_gaps / span_sec), 9) AS l0,
         round(ln({_S} * (n_gaps / span_sec)), 9) AS l1,
         {_GAMMA} * round(ln(CAST(n_gaps AS DOUBLE)), 9) AS g
  FROM gaps
),
folded AS (
  SELECT event_type, n_gaps,
    list_reduce(
      list_prepend([0.0, g, 0.0],
        list_transform(xs, x -> [x, 0.0, 0.0])),
      (acc, x) -> [
        least(acc[1], acc[2]) + (lam0 * x[1] - l0),
        least(acc[2], acc[1] + g) + (lam1 * x[1] - l1),
        acc[3] + CASE WHEN least(acc[2], acc[1] + g) + (lam1 * x[1] - l1)
                         < least(acc[1], acc[2]) + (lam0 * x[1] - l0)
                      THEN 1.0 ELSE 0.0 END
      ]) AS st
  FROM rates
)
SELECT event_type,
       CAST(n_gaps AS BIGINT) AS n_gaps,
       round(st[1], 6) AS cost_base,
       round(st[2], 6) AS cost_burst,
       CAST(st[3] AS BIGINT) AS n_burst_steps
FROM folded
ORDER BY event_type
""",
    description="Kleinberg two-state burst detection per event type: "
    "inter-arrival gaps feed a forward Viterbi over a base-rate state "
    "(lambda = n/T) and a 2x burst state, entering the burst costs "
    "gamma*ln(n); steps where the burst state is cheaper are counted. "
    "The principled replacement for threshold spike alerts (it trades "
    "off fit against state-switch cost instead of eyeballing a cutoff). "
    "Runs under the cross-engine fold contract: 3-element DOUBLE "
    "accumulator [cost0, cost1, burst_steps], identical IEEE op order in "
    "Spark aggregate and DuckDB list_reduce; the per-type logs are "
    "evaluated once (bounded set) and snapped to 9 dp before entering "
    "the fold. One shuffle to type lists; state is O(1) per series — the "
    "streaming form drops straight into applyInPandasWithState.",
    tags=("events", "timeseries", "anomaly", "iterative"),
)
def events_kleinberg_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s_mult, gamma = float(_S), float(_GAMMA)
    ordered = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.struct(
                "ts",
                "event_id",
                F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
            ).alias("x"),
        )
        .groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("x")), lambda e: e["us"]
            ).alias("us")
        )
        .filter(F.size("us") >= 2)
    )
    n = F.size("us")
    gaps = ordered.select(
        "event_type",
        F.zip_with(
            F.slice("us", 2, n - 1),
            F.slice("us", 1, n - 1),
            lambda a, b: (a - b) / 1000000.0,
        ).alias("xs"),
        (n - 1).alias("n_gaps"),
        (
            (F.element_at("us", n) - F.element_at("us", 1)) / 1000000.0
        ).alias("span_sec"),
    )
    lam0 = F.col("n_gaps") / F.col("span_sec")
    rates = gaps.select(
        "event_type",
        "xs",
        "n_gaps",
        lam0.alias("lam0"),
        (s_mult * lam0).alias("lam1"),
        F.round(F.log(lam0), 9).alias("l0"),
        F.round(F.log(s_mult * lam0), 9).alias("l1"),
        (gamma * F.round(F.log(F.col("n_gaps").cast("double")), 9)).alias(
            "g"
        ),
    )

    def step(acc, x):
        c0 = F.element_at(acc, 1)
        c1 = F.element_at(acc, 2)
        nb = F.element_at(acc, 3)
        n0 = F.least(c0, c1) + (F.col("lam0") * x - F.col("l0"))
        n1 = F.least(c1, c0 + F.col("g")) + (F.col("lam1") * x - F.col("l1"))
        return F.array(n0, n1, nb + F.when(n1 < n0, 1.0).otherwise(0.0))

    folded = rates.select(
        "event_type",
        "n_gaps",
        F.aggregate(
            "xs", F.array(F.lit(0.0), F.col("g"), F.lit(0.0)), step
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        F.round(F.element_at("st", 1), 6).alias("cost_base"),
        F.round(F.element_at("st", 2), 6).alias("cost_burst"),
        F.element_at("st", 3).cast("bigint").alias("n_burst_steps"),
    )
