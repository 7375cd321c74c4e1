"""Hundred-forty-sixth wave: Theil-Sen slope and the Mann-Kendall
trend test.

The robust-trend pair every monitoring stack wants: Mann-Kendall says
WHETHER a monotone trend exists (rank-based, outlier-immune), Theil-Sen
says HOW STEEP (median of pairwise slopes, 29% breakdown point).  Both
run on the SAME all-pairs table over the monthly order-count series —
which is calendar-bounded (~80 points → ~3k pairs), so the quadratic
pair explode is a constant-size object at ANY corpus scale; the
corpus-sized work is one month-count aggregate.

  * agg_mann_kendall — S = Σ sign(x_j - x_i) over i<j (exact integer),
    tie-corrected variance, and the normal z with continuity
    correction.
  * agg_theil_sen_trend — exact median of pairwise slopes (total
    (slope, i, j) order; even count averages the middle two),
    plus the Theil-Sen intercept median(y) - b·median(t).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_SERIES_SQL = """series AS (
  SELECT epoch(date_trunc('month', o_orderdate))::BIGINT // 86400 AS tday,
         COUNT(*) AS x
  FROM orders GROUP BY 1
)"""


@register(
    "agg_mann_kendall",
    oracle=f"""
WITH {_SERIES_SQL},
pairs AS (
  SELECT CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sg
  FROM series a JOIN series b ON a.tday < b.tday
),
sstat AS (SELECT CAST(SUM(sg) AS BIGINT) AS s FROM pairs),
ties AS (
  SELECT x, COUNT(*) AS tcount FROM series GROUP BY x HAVING COUNT(*) > 1
),
var_ AS (
  SELECT (SELECT COUNT(*) FROM series) AS n,
         COALESCE(SUM(tcount * (tcount - 1) * (2 * tcount + 5)), 0) AS tie_adj
  FROM ties
)
SELECT v.n AS n_points,
       st.s AS mk_s,
       (v.n * (v.n - 1) * (2 * v.n + 5) - v.tie_adj) / 18.0 AS mk_var,
       CASE WHEN st.s > 0
            THEN (st.s - 1) / sqrt((v.n * (v.n - 1) * (2 * v.n + 5)
                                    - v.tie_adj) / 18.0)
            WHEN st.s < 0
            THEN (st.s + 1) / sqrt((v.n * (v.n - 1) * (2 * v.n + 5)
                                    - v.tie_adj) / 18.0)
            ELSE 0.0 END AS mk_z
FROM sstat st CROSS JOIN var_ v
""",
    description="Mann-Kendall monotone-trend test on monthly order "
    "counts: S = Σ sign(x_j - x_i) over ordered pairs (exact integer), "
    "tie-corrected variance n(n-1)(2n+5)/18 - Σt(t-1)(2t+5)/18, z with "
    "the ±1 continuity correction — the nonparametric 'is this series "
    "drifting' detector that outliers can't swing (the parametric "
    "sibling is the OLS slope in agg_linreg_by_group). The all-pairs "
    "table is calendar-bounded (~80 months → ~3k pairs — a constant at "
    "any corpus scale); the corpus-sized work is one month-count "
    "aggregate.",
    tags=("agg", "timeseries", "stats"),
)
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "unix_micros(date_trunc('month', o_orderdate))"
                " div 86400000000"
            ).alias("tday")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint()  # pairs, ties and n all read it
    )
    a, b = series.alias("a"), series.alias("b")
    sg = (
        F.when(F.col("b.x") > F.col("a.x"), 1)
        .when(F.col("b.x") < F.col("a.x"), -1)
        .otherwise(0)
    )
    sstat = (
        a.join(b, F.col("a.tday") < F.col("b.tday"))
        .agg(F.sum(sg).cast("bigint").alias("s"))
    )
    ties = (
        series.groupBy("x")
        .agg(F.count(F.lit(1)).alias("tcount"))
        .filter(F.col("tcount") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tcount")
                    * (F.col("tcount") - 1)
                    * (2 * F.col("tcount") + 5)
                ),
                F.lit(0),
            ).alias("tie_adj")
        )
    )
    n_df = series.agg(F.count(F.lit(1)).alias("n"))
    joined = sstat.crossJoin(F.broadcast(ties)).crossJoin(
        F.broadcast(n_df)
    )
    var_ = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_adj")
    ) / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_))
        .otherwise(0.0)
    )
    return joined.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.col("s").alias("mk_s"),
        var_.alias("mk_var"),
        z.alias("mk_z"),
    )


@register(
    "agg_theil_sen_trend",
    oracle=f"""
WITH {_SERIES_SQL},
slopes AS (
  SELECT CAST(b.x - a.x AS DOUBLE) / (b.tday - a.tday) AS m,
         a.tday AS i, b.tday AS j
  FROM series a JOIN series b ON a.tday < b.tday
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, i, j) AS rn,
         COUNT(*) OVER () AS np
  FROM slopes
),
med_slope AS (
  SELECT CASE WHEN np % 2 = 1
              THEN MAX(CASE WHEN rn = (np + 1) // 2 THEN m END)
              ELSE (MAX(CASE WHEN rn = np // 2 THEN m END)
                    + MAX(CASE WHEN rn = np // 2 + 1 THEN m END)) / 2.0
         END AS b
  FROM ranked GROUP BY np
),
medians AS (
  SELECT CAST(MEDIAN(x) AS DOUBLE) AS med_x,
         CAST(MEDIAN(tday) AS DOUBLE) AS med_t,
         COUNT(*) AS n
  FROM series
)
SELECT CAST(m2.n AS BIGINT) AS n_points,
       ms.b AS theil_sen_slope,
       m2.med_x - ms.b * m2.med_t AS theil_sen_intercept
FROM med_slope ms CROSS JOIN medians m2
""",
    description="Theil-Sen robust trend on monthly order counts: the "
    "EXACT median of all pairwise slopes (total (slope, i, j) order; "
    "even counts average the middle two — integer-over-integer "
    "divisions, so every slope is one deterministic IEEE value), "
    "intercept = median(x) - b·median(t) with exact rank medians. The "
    "29%-breakdown slope that a single outlier month can't bend, "
    "companion to agg_mann_kendall's significance. The quadratic slope "
    "table is calendar-bounded; the rank stage sorts ~3k rows however "
    "big the corpus.",
    tags=("agg", "timeseries", "stats"),
)
def agg_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "unix_micros(date_trunc('month', o_orderdate))"
                " div 86400000000"
            ).alias("tday")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint()
    )
    # guard: the pairwise slope table is quadratic in MONTHLY BUCKETS,
    # not rows (36 months -> 630 pairs; 100 years -> ~719k pairs, still
    # one executor's sort). Fail loudly rather than silently serialize
    # the adjudicated global rank if a fixture ever spans centuries.
    n_months = series.count()
    if n_months > 1200:
        raise ValueError(
            f"agg_theil_sen_trend: {n_months} monthly buckets -> "
            f"~{n_months * (n_months - 1) // 2:,} pairwise slopes in a "
            "single-partition rank; decompose onto operators/ranking.py "
            "helpers before running a span this long"
        )
    a, b = series.alias("a"), series.alias("b")
    slopes = a.join(b, F.col("a.tday") < F.col("b.tday")).select(
        (
            (F.col("b.x") - F.col("a.x")).cast("double")
            / (F.col("b.tday") - F.col("a.tday"))
        ).alias("m"),
        F.col("a.tday").alias("i"),
        F.col("b.tday").alias("j"),
    )
    ranked = slopes.select(
        "m",
        F.row_number().over(Window.orderBy("m", "i", "j")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("np"),
    )
    med_slope = ranked.groupBy("np").agg(
        F.when(
            F.col("np") % 2 == 1,
            F.max(
                F.when(
                    F.col("rn") == F.expr("(np + 1) div 2"), F.col("m")
                )
            ),
        )
        .otherwise(
            (
                F.max(
                    F.when(F.col("rn") == F.expr("np div 2"), F.col("m"))
                )
                + F.max(
                    F.when(
                        F.col("rn") == F.expr("np div 2 + 1"), F.col("m")
                    )
                )
            )
            / 2.0
        )
        .alias("b")
    )
    medians = series.agg(
        F.median("x").cast("double").alias("med_x"),
        F.median("tday").cast("double").alias("med_t"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        med_slope.crossJoin(F.broadcast(medians))
        .select(
            F.col("n").cast("bigint").alias("n_points"),
            F.col("b").alias("theil_sen_slope"),
            (F.col("med_x") - F.col("b") * F.col("med_t")).alias(
                "theil_sen_intercept"
            ),
        )
    )
