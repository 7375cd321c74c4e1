"""Seventy-first wave: SPC control charting and mutual information.

agg_spc_individuals_chart is the Shewhart I-MR chart — the classic
statistical-process-control monitor that predates (and still
complements) CUSUM/MAD anomaly detection: limits derive from the
short-term moving range, so slow drift widens nothing and points
breaching x̄ ± 2.66·MR̄ are genuine special causes.
agg_mutual_information scores how much a categorical feature (event
type) tells you about an outcome (user converted) — the
feature-selection statistic that, unlike chi², is measured in bits and
comparable across features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "agg_spc_individuals_chart",
    oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS x
  FROM events GROUP BY date_trunc('day', ts)
), mr AS (
  SELECT day, x,
         abs(x - lag(x) OVER (ORDER BY day)) AS mr
  FROM daily
), lims AS (
  SELECT CAST(CAST(SUM(CAST(round(x, 9) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS xbar,
         CAST(CAST(SUM(CAST(round(mr, 9) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE)
           / COUNT(mr) AS mrbar
  FROM mr
)
SELECT m.day, round(m.x, 6) AS x,
       round(l.xbar, 6) AS center,
       round(l.xbar - 2.66 * l.mrbar, 6) AS lcl,
       round(l.xbar + 2.66 * l.mrbar, 6) AS ucl,
       CAST(m.x < l.xbar - 2.66 * l.mrbar
            OR m.x > l.xbar + 2.66 * l.mrbar AS BOOLEAN) AS out_of_control
FROM mr m CROSS JOIN lims l
ORDER BY m.day
""",
    description="Shewhart individuals control chart (I-MR) over the "
    "daily mean value: the center line is the grand mean, the control "
    "limits are x̄ ± 2.66·MR̄ with MR̄ the mean |day-over-day| moving "
    "range — the SPC classic whose limits come from SHORT-TERM "
    "variation, so a slowly drifting process still trips them (the "
    "failure mode a naive ±3·overall-σ band hides, and the "
    "retrospective complement of events_cusum_drift's sequential "
    "detection). Daily means and the two limit aggregates flow through "
    "DECIMAL sums (values rounded to 9 dp first); the moving range "
    "uses the ordered lag window. Shape: one daily pre-aggregate, "
    "then #days-row windows and a 1-row limits frame.",
    tags=("agg", "stats", "monitoring", "timeseries"),
)
def agg_spc_individuals_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("x")
        )
    )
    mr = daily.withColumn(
        "mr", F.abs(F.col("x") - F.lag("x").over(Window.orderBy("day")))
    )
    lims = mr.agg(
        (
            F.sum(F.round("x", 9).cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("xbar"),
        (
            F.sum(F.round("mr", 9).cast("decimal(18,9)")).cast("double")
            / F.count("mr")
        ).alias("mrbar"),
    )
    lcl = F.col("xbar") - 2.66 * F.col("mrbar")
    ucl = F.col("xbar") + 2.66 * F.col("mrbar")
    return (
        mr.crossJoin(F.broadcast(lims))
        .select(
            "day",
            F.round("x", 6).alias("x"),
            F.round("xbar", 6).alias("center"),
            F.round(lcl, 6).alias("lcl"),
            F.round(ucl, 6).alias("ucl"),
            ((F.col("x") < lcl) | (F.col("x") > ucl)).alias("out_of_control"),
        )
        
    )


@register(
    "agg_mutual_information",
    oracle="""
WITH labeled AS (
  SELECT event_type, epoch_us(ts) AS us,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
  FROM events
), rows_ AS (
  SELECT event_type AS x,
         CASE WHEN next_p IS NOT NULL
                   AND next_p - us <= 86400000000 THEN 1 ELSE 0 END AS y,
         COUNT(*) AS n
  FROM labeled
  WHERE event_type <> 'purchase'
  GROUP BY 1, 2
), margins AS (
  SELECT x, SUM(n) AS nx FROM rows_ GROUP BY x
), ymarg AS (
  SELECT y, SUM(n) AS ny FROM rows_ GROUP BY y
), tot AS (SELECT SUM(n) AS nt FROM rows_),
cells AS (
  SELECT r.n, m.nx, ym.ny, t.nt,
         round(log2(CAST(r.n AS DOUBLE) * t.nt
                    / (CAST(m.nx AS DOUBLE) * ym.ny)), 9) AS lterm
  FROM rows_ r JOIN margins m USING (x) JOIN ymarg ym USING (y) CROSS JOIN tot t
), hy AS (
  SELECT -SUM(CAST(ny AS DOUBLE) / (SELECT nt FROM tot)
              * round(log2(CAST(ny AS DOUBLE) / (SELECT nt FROM tot)), 9))
         + 0.0 AS h
  FROM ymarg
)
SELECT CAST((SELECT COUNT(*) FROM margins) AS BIGINT) AS n_feature_values,
       CAST(MAX(nt) AS BIGINT) AS n_rows,
       round(SUM(CAST(n AS DOUBLE) / nt * lterm), 6) AS mi_bits,
       round((SELECT h FROM hy), 6) AS h_outcome_bits,
       CASE WHEN (SELECT h FROM hy) = 0 THEN NULL
            ELSE round(SUM(CAST(n AS DOUBLE) / nt * lterm)
                       / (SELECT h FROM hy), 6) END
         AS uncertainty_reduction
FROM cells
""",
    description="Mutual information between the event-type feature and "
    "NEXT-24H conversion (a purchase by the same user within a day "
    "after the event): I(X;Y) = Σ p(x,y)·log2(p(x,y)/(p(x)p(y))) over "
    "non-purchase events labeled with whether their user ever "
    "— the feature-selection statistic measured in BITS, so "
    "(unlike agg_chi_square_independence's χ², which grows with N) it "
    "is comparable across candidate features, and its ratio to the "
    "outcome entropy H(Y) is the uncertainty-coefficient normalization "
    "(how much of the conversion uncertainty this one feature "
    "removes). Purchase events themselves are excluded from the "
    "feature side — they'd leak the label; the forward-looking label "
    "comes from one ordered window (conditional min over the following "
    "frame — the as-of machinery pointed forward). Integer counts; "
    "log2 once per bounded cell, rounded to 9 dp. Shape: one user-"
    "partitioned window, one k x 2 cell aggregate, margins over a "
    "handful of rows.",
    tags=("agg", "stats", "feature"),
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    labeled = t(spark, sf_dir, "events").select(
        "event_type",
        us.alias("us"),
        F.min(F.when(F.col("event_type") == "purchase", us))
        .over(w_next)
        .alias("next_p"),
    )
    rows_ = (
        labeled.filter(F.col("event_type") != "purchase")
        .select(
            F.col("event_type").alias("x"),
            F.when(
                F.col("next_p").isNotNull()
                & (F.col("next_p") - F.col("us") <= 86_400_000_000),
                1,
            )
            .otherwise(0)
            .alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    margins = rows_.groupBy("x").agg(F.sum("n").alias("nx"))
    ymarg = rows_.groupBy("y").agg(F.sum("n").alias("ny"))
    tot = rows_.agg(F.sum("n").alias("nt"))
    nfeat = margins.agg(F.count(F.lit(1)).alias("k"))
    cells = (
        rows_.join(F.broadcast(margins), "x")
        .join(F.broadcast(ymarg), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "nx",
            "ny",
            "nt",
            F.round(
                F.log2(
                    F.col("n").cast("double")
                    * F.col("nt")
                    / (F.col("nx").cast("double") * F.col("ny"))
                ),
                9,
            ).alias("lterm"),
        )
    )
    hy = (
        ymarg.crossJoin(F.broadcast(tot))
        .agg(
            (
                -F.sum(
                    F.col("ny").cast("double")
                    / F.col("nt")
                    * F.round(
                        F.log2(F.col("ny").cast("double") / F.col("nt")), 9
                    )
                )
                + F.lit(0.0)
            ).alias("h")
        )
    )
    mi = F.sum(F.col("n").cast("double") / F.col("nt") * F.col("lterm"))
    return (
        cells.agg(F.max("nt").cast("bigint").alias("n_rows"), mi.alias("mi"))
        .crossJoin(F.broadcast(nfeat))
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("k").cast("bigint").alias("n_feature_values"),
            "n_rows",
            F.round("mi", 6).alias("mi_bits"),
            F.round("h", 6).alias("h_outcome_bits"),
            F.when(F.col("h") != 0, F.round(F.col("mi") / F.col("h"), 6)).alias(
                "uncertainty_reduction"
            ),
        )
    )
