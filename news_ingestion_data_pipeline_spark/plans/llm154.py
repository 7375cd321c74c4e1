"""Hundred-fifty-fourth wave: rolling cross-correlation.

  * window_rolling_corr — the co-movement monitor: 24-hour rolling
    Pearson correlation between the hourly click and view counts, all
    sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) as ROWS-frame window
    sums of INTEGERS — exact — with one IEEE correlation expression
    per row snapped to 6 dp.  The pairwise generalization of
    events_autocorrelation's fixed-lag view: this is what detects two
    metrics decoupling in near-real time (a breakage signature) without
    any model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_WIN = 24


@register(
    "window_rolling_corr",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1
),
rolled AS (
  SELECT h, x, y,
         COUNT(*) OVER w AS n,
         SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
         SUM(x * y) OVER w AS sxy,
         SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
  FROM hourly
  WINDOW w AS (ORDER BY h ROWS BETWEEN {_WIN - 1} PRECEDING
               AND CURRENT ROW)
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(n AS BIGINT) AS n_window,
       CASE WHEN n >= {_WIN}
             AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round(
              (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
              6)
       END AS rolling_corr
FROM rolled
ORDER BY h
""",
    description=f"Rolling {_WIN}-hour Pearson correlation between hourly "
    "click and view volumes: every sufficient statistic (n, Σx, Σy, "
    "Σxy, Σx², Σy²) is a ROWS-frame window sum of INTEGERS — exact in "
    "both engines — and the correlation is one IEEE expression per row "
    "snapped to 6 dp (NULL until the window fills or a side is "
    "constant, with the degeneracy guarded as an exact integer "
    "comparison). The two-metric decoupling monitor: a healthy site "
    "has clicks tracking views; the hours where this correlation dives "
    "are the incident windows. One hourly aggregate + one ordered "
    "window pass, range-partitionable by calendar at scale.",
    tags=("window", "events", "timeseries", "stats"),
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("y"),
        )
    )
    w = Window.orderBy("h").rowsBetween(-(_WIN - 1), 0)
    rolled = hourly.select(
        "h",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    denx = n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    deny = n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    ok = (
        (F.col("n") >= _WIN)
        & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    )
    return rolled.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").cast("bigint").alias("n_window"),
        F.when(ok, F.round(num / (F.sqrt(denx) * F.sqrt(deny)), 6)).alias(
            "rolling_corr"
        ),
    ).orderBy("h")
