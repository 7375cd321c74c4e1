"""Hundred-fourteenth wave: Croston intermittent-demand forecasting and
uplift T-learner.

  * lineitem_croston_forecast — the forecasting method the EWMA/Holt
    family gets WRONG on sparse series: Croston's decomposition into
    demand-size EWMA and demand-interval EWMA over zero-filled weekly
    brand demand, per-week rate = size/interval.  Runs as the engine's
    cross-engine fold contract (array accumulator, identical IEEE op
    sequence in Spark aggregate and DuckDB list_reduce).
  * events_uplift_tlearner — two-model uplift estimation: OLS of
    outcome (purchase value) on exposure (event count) fit separately
    per assignment arm from exact decimal power sums, then the
    treatment effect read off as the prediction gap on a fixed
    exposure grid.  The causal sibling of events_cuped_adjustment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df

_ALPHA = "0.2"


@register(
    "lineitem_croston_forecast",
    oracle=f"""
WITH wk AS (
  SELECT p.p_brand,
         (epoch(l.l_shipdate)::BIGINT // 86400) // 7 AS week,
         SUM(l.l_quantity) AS d
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, 2
), bounds AS (
  SELECT MIN(week) AS w0, MAX(week) AS w1 FROM wk
), grid AS (
  SELECT b.p_brand, g.week
  FROM (SELECT DISTINCT p_brand FROM wk) b
  CROSS JOIN (SELECT unnest(range(w0, w1 + 1)) AS week FROM bounds) g
), series AS (
  SELECT g.p_brand,
         list(COALESCE(wk.d, 0.0) ORDER BY g.week) AS ds,
         SUM(CASE WHEN COALESCE(wk.d, 0.0) > 0 THEN 1 ELSE 0 END)
           AS n_demand_weeks,
         COUNT(*) AS n_weeks
  FROM grid g LEFT JOIN wk ON wk.p_brand = g.p_brand AND wk.week = g.week
  GROUP BY g.p_brand
), folded AS (
  SELECT p_brand, n_weeks, n_demand_weeks,
    list_reduce(
      list_prepend([0.0, 0.0, 1.0, 0.0],
        list_transform(ds, d -> [d, 0.0, 0.0, 0.0])),
      (acc, x) -> CASE WHEN x[1] > 0 THEN [
          CASE WHEN acc[4] > 0.5
               THEN acc[1] + {_ALPHA} * (x[1] - acc[1]) ELSE x[1] END,
          CASE WHEN acc[4] > 0.5
               THEN acc[2] + {_ALPHA} * (acc[3] - acc[2]) ELSE acc[3] END,
          1.0, 1.0]
        ELSE [acc[1], acc[2], acc[3] + 1.0, acc[4]] END
    ) AS st
  FROM series
)
SELECT p_brand,
       CAST(n_weeks AS BIGINT) AS n_weeks,
       CAST(n_demand_weeks AS BIGINT) AS n_demand_weeks,
       round(st[1], 6) AS demand_size,
       round(st[2], 6) AS demand_interval,
       round(st[1] / st[2], 6) AS rate_per_week
FROM folded
ORDER BY p_brand
""",
    description="Croston's intermittent-demand forecast per part brand: "
    "weekly brand demand zero-filled onto the global week grid, then the "
    "classic decomposition — EWMA of nonzero demand SIZES and EWMA of "
    "inter-demand INTERVALS (alpha 0.2, interval counter rides in the "
    "fold state), forecast rate = size/interval. Exactly the method that "
    "beats plain EWMA when most periods are zero (spare parts, long-tail "
    "SKUs). Runs under the cross-engine fold contract (Holt/EWMA "
    "precedent): 4-element DOUBLE array accumulator [size, interval, "
    "periods-since-demand, started], identical IEEE op order in Spark's "
    "aggregate and DuckDB's list_reduce, so state is bit-exact. Scale "
    "shape: one shuffle to (brand, week), one to brand lists; series "
    "length is calendar-bounded so per-group state stays small however "
    "large the fact table.",
    tags=("lineitem", "timeseries", "forecast"),
)
def lineitem_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = float(_ALPHA)
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        F.expr(
            "(unix_micros(cast(l_shipdate as timestamp)) div 86400000000)"
            " div 7"
        ).alias("week"),
    )
    pt = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    wk = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", "week")
        .agg(F.sum("l_quantity").alias("d"))
    )
    bounds = wk.agg(
        F.min("week").alias("w0"), F.max("week").alias("w1")
    )
    grid = (
        wk.select("p_brand")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "p_brand",
            F.explode(F.sequence("w0", "w1")).alias("week"),
        )
    )
    series = (
        grid.join(wk, ["p_brand", "week"], "left")
        .select(
            "p_brand",
            "week",
            F.coalesce("d", F.lit(0.0)).alias("d"),
        )
        .groupBy("p_brand")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("week", "d"))),
                lambda s: s["d"],
            ).alias("ds"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias(
                "n_demand_weeks"
            ),
            F.count(F.lit(1)).alias("n_weeks"),
        )
    )

    def step(acc, x):
        z, p, q, s = (
            F.element_at(acc, 1),
            F.element_at(acc, 2),
            F.element_at(acc, 3),
            F.element_at(acc, 4),
        )
        return F.when(
            x > 0,
            F.array(
                F.when(s > 0.5, z + a * (x - z)).otherwise(x),
                F.when(s > 0.5, p + a * (q - p)).otherwise(q),
                F.lit(1.0),
                F.lit(1.0),
            ),
        ).otherwise(F.array(z, p, q + 1.0, s))

    folded = series.select(
        "p_brand",
        "n_weeks",
        "n_demand_weeks",
        F.aggregate(
            "ds", F.array(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)), step
        ).alias("st"),
    )
    return folded.select(
        "p_brand",
        F.col("n_weeks").cast("bigint").alias("n_weeks"),
        F.col("n_demand_weeks").cast("bigint").alias("n_demand_weeks"),
        F.round(F.element_at("st", 1), 6).alias("demand_size"),
        F.round(F.element_at("st", 2), 6).alias("demand_interval"),
        F.round(F.element_at("st", 1) / F.element_at("st", 2), 6).alias(
            "rate_per_week"
        ),
    )


@register(
    "events_uplift_tlearner",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         user_id % 2 AS arm,
         COUNT(*) AS x,
         CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,6))
                            ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR)
              AS DOUBLE) AS y
  FROM events GROUP BY user_id
),
fit AS (
  SELECT arm,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(x * CAST(y AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
           AS sxy
  FROM per_user GROUP BY arm
),
coef AS (
  SELECT arm,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
  FROM fit
),
wide AS (
  SELECT MAX(CASE WHEN arm = 1 THEN a END) AS a_t,
         MAX(CASE WHEN arm = 1 THEN b END) AS b_t,
         MAX(CASE WHEN arm = 0 THEN a END) AS a_c,
         MAX(CASE WHEN arm = 0 THEN b END) AS b_c
  FROM coef
)
SELECT g.x AS exposure,
       a_t + b_t * g.x AS pred_treated,
       a_c + b_c * g.x AS pred_control,
       (a_t + b_t * g.x) - (a_c + b_c * g.x) AS uplift
FROM wide CROSS JOIN (SELECT unnest([5, 10, 20]) AS x) g
ORDER BY exposure
""",
    description="Uplift T-learner: per-user outcome (exact-decimal sum of "
    "purchase values) regressed on exposure (event count) SEPARATELY per "
    "assignment arm (user_id % 2 — the synthetic A/B split shared with "
    "events_ab_test_z), effect = prediction gap on a fixed exposure grid. "
    "Both OLS fits are closed-form from 5 power sums (n, Σx, Σx², Σy, "
    "Σxy) with the decimal-exact treatment, so slopes, intercepts and "
    "uplift are bit-identical across engines. The 100 TB shape: one "
    "per-user aggregate, then a 2-row sufficient-statistics reduce — "
    "model fitting without ever shuffling raw events twice.",
    tags=("events", "stats", "causal"),
)
def events_uplift_tlearner(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,6)"),
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            )
            .cast("double")
            .alias("y"),
        )
        .select(
            (F.col("user_id") % 2).alias("arm"),
            "x",
            "y",
        )
    )
    fit = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y").cast("decimal(28,6)"))
        .cast("double")
        .alias("sxy"),
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    coef = fit.select(
        "arm", b.alias("b"), ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a")
    )
    wide = coef.agg(
        F.max(F.when(F.col("arm") == 1, F.col("a"))).alias("a_t"),
        F.max(F.when(F.col("arm") == 1, F.col("b"))).alias("b_t"),
        F.max(F.when(F.col("arm") == 0, F.col("a"))).alias("a_c"),
        F.max(F.when(F.col("arm") == 0, F.col("b"))).alias("b_c"),
    )
    grid = local_df(
        wide.sparkSession, [(5,), (10,), (20,)], "x int"
    )
    return (
        wide.crossJoin(F.broadcast(grid))
        .select(
            F.col("x").alias("exposure"),
            (F.col("a_t") + F.col("b_t") * F.col("x")).alias("pred_treated"),
            (F.col("a_c") + F.col("b_c") * F.col("x")).alias("pred_control"),
            (
                (F.col("a_t") + F.col("b_t") * F.col("x"))
                - (F.col("a_c") + F.col("b_c") * F.col("x"))
            ).alias("uplift"),
        )
        
    )
