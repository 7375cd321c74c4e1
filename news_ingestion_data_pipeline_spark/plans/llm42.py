"""Forty-second wave: forecast backtesting (one-step naive and
seasonal-naive sMAPE over the hourly series — the baseline every fancy
forecaster must beat) and the CTAS / INSERT INTO catalog surface.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_forecast_backtest",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS y
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, y,
         LAG(y, 1) OVER w AS naive,
         LAG(y, 24) OVER w AS snaive
  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h)
), terms AS (
  SELECT event_type,
         CASE WHEN naive IS NOT NULL AND y + naive > 0
              THEN CAST(2.0 * abs(y - naive) / (y + naive)
                        AS DECIMAL(28,12)) END AS t_naive,
         CASE WHEN snaive IS NOT NULL AND y + snaive > 0
              THEN CAST(2.0 * abs(y - snaive) / (y + snaive)
                        AS DECIMAL(28,12)) END AS t_snaive
  FROM lagged
)
SELECT event_type,
       CAST(COUNT(t_naive) AS BIGINT) AS n_naive,
       round(CAST(CAST(SUM(t_naive) AS VARCHAR) AS DOUBLE)
             / COUNT(t_naive), 6) AS smape_naive,
       CAST(COUNT(t_snaive) AS BIGINT) AS n_seasonal,
       round(CAST(CAST(SUM(t_snaive) AS VARCHAR) AS DOUBLE)
             / COUNT(t_snaive), 6) AS smape_seasonal
FROM terms
GROUP BY event_type
ORDER BY event_type
""",
    description="Forecast backtest: one-step-ahead sMAPE of the NAIVE "
    "(last value) and SEASONAL-NAIVE (same hour yesterday) predictors "
    "over each event type's hourly series — the two baselines any "
    "forecasting pipeline (events_holt_forecast, "
    "events_seasonal_decompose) must beat before it earns compute; "
    "seasonal-naive beating naive also CONFIRMS the daily cycle the "
    "ACF showed. Each sMAPE term 2|y-yhat|/(y+yhat) is one IEEE "
    "division on integer counts, then cast to a fixed-scale DECIMAL so "
    "the per-series sum is associative (partition-order-proof); one "
    "window over the hourly series, one aggregate.",
    tags=("events", "timeseries", "stats"),
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("naive"),
        F.lag("y", 24).over(w).alias("snaive"),
    )

    def term(pred: str):
        return F.when(
            F.col(pred).isNotNull() & (F.col("y") + F.col(pred) > 0),
            (
                2.0
                * F.abs(F.col("y") - F.col(pred))
                / (F.col("y") + F.col(pred))
            ).cast("decimal(28,12)"),
        )

    terms = lagged.select(
        "event_type", term("naive").alias("t_naive"), term("snaive").alias("t_snaive")
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count("t_naive").cast("bigint").alias("n_naive"),
            F.round(
                F.sum("t_naive").cast("string").cast("double")
                / F.count("t_naive"),
                6,
            ).alias("smape_naive"),
            F.count("t_snaive").cast("bigint").alias("n_seasonal"),
            F.round(
                F.sum("t_snaive").cast("string").cast("double")
                / F.count("t_snaive"),
                6,
            ).alias("smape_seasonal"),
        )
        
    )


@register(
    "sql_ctas_insert",
    oracle="""
WITH src AS (
  SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations
  FROM nation GROUP BY n_regionkey
  UNION ALL
  SELECT -1 AS n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations
  FROM nation
)
SELECT n_regionkey, n_nations FROM src
ORDER BY n_regionkey
""",
    description="Catalog DDL surface: CREATE TABLE ... USING parquet AS "
    "SELECT (CTAS into the session warehouse), then INSERT INTO the "
    "created table, then read it back through the catalog by name — "
    "the persistent-table lifecycle (vs the temp views every other "
    "query uses), which is how downstream consumers without the "
    "DataFrame handle find results. The oracle restates both writes "
    "relationally, so the hash match certifies the catalog round-trip "
    "byte-preserved the rows. DROP-first keeps the query idempotent "
    "across reruns.",
    tags=("sql", "storage", "pipeline"),
)
def sql_ctas_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from urllib.parse import urlparse

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = f"region_counts_{sfx}"
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_ctas")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # a fresh session's in-memory catalog doesn't know about a previous
    # run's managed-table directory; clear the location too so CREATE
    # never hits LOCATION_ALREADY_EXISTS
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {tbl} USING parquet AS
        SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation_ctas GROUP BY n_regionkey
        """
    )
    spark.sql(
        f"""
        INSERT INTO {tbl}
        SELECT -1 AS n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation_ctas
        """
    )
    return spark.sql(
        f"SELECT n_regionkey, n_nations FROM {tbl} ORDER BY n_regionkey"
    )
