"""Hundred-twenty-ninth wave: regression discontinuity and Poisson
goodness-of-fit.

  * events_regression_discontinuity — the fourth causal design in the
    family (DiD, CUPED, uplift T-learner shipped earlier): local linear
    fits on both sides of a cutoff in a running variable, treatment
    effect = the intercept jump AT the cutoff.  Closed-form OLS from
    exact decimal power sums inside a +/-30 bandwidth.
  * agg_poisson_gof — "is this arrival process actually Poisson":
    chi-square goodness-of-fit of per-user daily event counts against
    a Poisson with the observed mean, expected masses evaluated once
    per COUNT BIN (bounded set, 9-dp snapped) and folded through
    exact decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_CUT = 50
_BW = 30


@register(
    "events_regression_discontinuity",
    oracle=f"""
WITH base AS (
  SELECT o_custkey % 100 AS rv,
         CAST(o_custkey % 100 >= {_CUT} AS INT) AS side,
         o_totalprice AS y
  FROM orders
  WHERE o_custkey % 100 BETWEEN {_CUT - _BW} AND {_CUT + _BW - 1}
),
fit AS (
  SELECT side,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(rv - {_CUT}) AS DOUBLE) AS sx,
         CAST(SUM((rv - {_CUT}) * (rv - {_CUT})) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM((rv - {_CUT}) * CAST(y AS DECIMAL(18,2)))
                   AS VARCHAR) AS DOUBLE) AS sxy
  FROM base GROUP BY side
),
coef AS (
  SELECT side,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
  FROM fit
)
SELECT MAX(CASE WHEN side = 1 THEN a END) AS intercept_right,
       MAX(CASE WHEN side = 0 THEN a END) AS intercept_left,
       MAX(CASE WHEN side = 1 THEN a END)
         - MAX(CASE WHEN side = 0 THEN a END) AS rd_effect,
       MAX(CASE WHEN side = 1 THEN b END) AS slope_right,
       MAX(CASE WHEN side = 0 THEN b END) AS slope_left
FROM coef
""",
    description=f"Sharp regression-discontinuity estimator: running "
    f"variable o_custkey mod 100, cutoff {_CUT}, bandwidth ±{_BW}; local "
    "linear OLS fit on each side (centered at the cutoff so the "
    "intercept IS the boundary prediction), effect = the intercept jump. "
    "The design for 'a rule assigns treatment at a threshold' settings "
    "that DiD/CUPED can't identify. Both fits are closed-form from 5 "
    "exact power sums each (decimal money, integer running variable), "
    "so intercepts, slopes and the jump are bit-identical cross-engine. "
    "On this synthetic corpus the true jump is ~0 — the estimator's "
    "unbiasedness, not the effect size, is what the oracle certifies. "
    "Scale: one filtered aggregate to a 2-row sufficient-statistics "
    "table; the fact table is read once.",
    tags=("events", "stats", "causal"),
)
def events_regression_discontinuity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    rv = F.col("o_custkey") % 100
    base = (
        t(spark, sf_dir, "orders")
        .filter(rv.between(_CUT - _BW, _CUT + _BW - 1))
        .select(
            (rv - _CUT).alias("x"),
            (rv >= _CUT).cast("int").alias("side"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
        )
    )
    fit = base.groupBy("side").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    coef = fit.select(
        "side",
        b.alias("b"),
        ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a"),
    )
    right = F.max(F.when(F.col("side") == 1, F.col("a")))
    left = F.max(F.when(F.col("side") == 0, F.col("a")))
    return coef.agg(
        right.alias("intercept_right"),
        left.alias("intercept_left"),
        (right - left).alias("rd_effect"),
        F.max(F.when(F.col("side") == 1, F.col("b"))).alias("slope_right"),
        F.max(F.when(F.col("side") == 0, F.col("b"))).alias("slope_left"),
    )


_KMAX = 12


@register(
    "agg_poisson_gof",
    oracle=f"""
WITH per_user_day AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY user_id, 2
),
obs AS (
  SELECT LEAST(c, {_KMAX}) AS k, COUNT(*) AS n_obs
  FROM per_user_day GROUP BY 1
),
lam AS (
  SELECT CAST(SUM(k * n_obs) AS DOUBLE) / SUM(n_obs) AS l,
         SUM(n_obs) AS n_total
  FROM obs
),
expected AS (
  SELECT g.k, lam.n_total,
         CAST(round(
           CASE WHEN g.k < {_KMAX}
                THEN exp(-lam.l) * (lam.l ^ g.k) / factorial(CAST(g.k AS INT))
                ELSE 1.0 - list_sum(list_transform(range(0, {_KMAX}),
                       j -> exp(-lam.l) * (lam.l ^ j)
                            / factorial(CAST(j AS INT))))
           END, 9) AS DECIMAL(18,9)) AS p
  FROM (SELECT unnest(range(0, {_KMAX} + 1)) AS k) g CROSS JOIN lam
),
cells AS (
  SELECT e.k,
         COALESCE(o.n_obs, 0) AS n_obs,
         e.n_total,
         e.p
  FROM expected e LEFT JOIN obs o ON o.k = e.k
)
SELECT CAST(SUM(n_obs) AS BIGINT) AS n_cells_total,
       CAST(CAST(SUM(CAST(round(
           (n_obs - n_total * CAST(CAST(p AS VARCHAR) AS DOUBLE))
           * (n_obs - n_total * CAST(CAST(p AS VARCHAR) AS DOUBLE))
           / GREATEST(n_total * CAST(CAST(p AS VARCHAR) AS DOUBLE), 1e-12),
           9) AS DECIMAL(28,9))) AS VARCHAR) AS DOUBLE) AS chi_square,
       CAST({_KMAX} + 1 - 1 - 1 AS BIGINT) AS dof
FROM cells
""",
    description="Poisson goodness-of-fit for the arrival process: "
    "per-user-day event counts binned at 0..12+ (tail collapsed), "
    "expected Poisson masses at the observed mean evaluated ONCE per "
    "bin (bounded set, exp/pow snapped to 9 dp decimals, tail mass = "
    "1 - head sum so probabilities total exactly 1), chi-square folded "
    "through exact decimals. Answers 'is user activity actually "
    "memoryless or burstier than Poisson' — the model check behind "
    "rate-limit sizing and the burst detectors "
    "(events_kleinberg_bursts finds WHERE it's bursty; this tests IF). "
    "Scale: one (user, day) aggregate then a 13-row game.",
    tags=("agg", "events", "stats"),
)
def agg_poisson_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    pud = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 86400000000"
            ).alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    obs = pud.groupBy(
        F.least(F.col("c"), F.lit(_KMAX)).alias("k")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    lam = obs.agg(
        (
            F.sum(F.col("k") * F.col("n_obs")).cast("double")
            / F.sum("n_obs")
        ).alias("l"),
        F.sum("n_obs").alias("n_total"),
    )
    ks = lam.sparkSession.range(_KMAX + 1).select(
        F.col("id").cast("bigint").alias("k")
    )

    def pois(k_col, l_col):
        return (
            F.exp(-l_col)
            * F.pow(l_col, k_col)
            / F.factorial(k_col.cast("int"))
        )

    head = F.aggregate(
        F.sequence(F.lit(0), F.lit(_KMAX - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.exp(-F.col("l"))
        * F.pow(F.col("l"), j)
        / F.factorial(j.cast("int")),
    )
    expected = ks.crossJoin(F.broadcast(lam)).select(
        "k",
        "n_total",
        F.round(
            F.when(F.col("k") < _KMAX, pois(F.col("k"), F.col("l"))).otherwise(
                1.0 - head
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("p"),
    )
    cells = expected.join(obs, "k", "left").select(
        "k",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        "n_total",
        "p",
    )
    pd_ = F.col("p").cast("double")
    term = F.round(
        (F.col("n_obs") - F.col("n_total") * pd_)
        * (F.col("n_obs") - F.col("n_total") * pd_)
        / F.greatest(F.col("n_total") * pd_, F.lit(1e-12)),
        9,
    ).cast("decimal(28,9)")
    return cells.agg(
        F.sum("n_obs").cast("bigint").alias("n_cells_total"),
        F.sum(term).cast("double").alias("chi_square"),
        F.lit(_KMAX - 1).cast("bigint").alias("dof"),
    )
