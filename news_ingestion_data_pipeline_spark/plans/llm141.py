"""Hundred-forty-first wave: NOT IN null semantics and retention curve
fitting.

  * join_null_aware_anti_in — the SQL trap every migration hits once:
    `x NOT IN (subquery)` is three-valued — ONE NULL in the subquery
    makes the predicate never-true and the result EMPTY.  Spark plans
    this as a dedicated NullAwareAntiJoin; this query certifies both
    engines agree on the trap (with-NULL count = 0) AND on the sane
    null-free rewrite, side by side.
  * events_retention_powerlaw_fit — the growth-team curve fit: day-k
    retention (k = 1..14) regressed as ln r = a + b·ln k; the shape
    parameter b says whether retention flattens (b → 0) or decays
    hard.  Log points are per-k (bounded set, 9-dp snapped), the OLS
    runs on exact decimal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "join_null_aware_anti_in",
    oracle="""
WITH poisoned AS (
  SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer
),
clean AS (
  SELECT k FROM poisoned WHERE k IS NOT NULL
),
with_null AS (
  SELECT COUNT(*) AS n FROM orders WHERE o_custkey NOT IN (SELECT k FROM poisoned)
),
without_null AS (
  SELECT COUNT(*) AS n FROM orders WHERE o_custkey NOT IN (SELECT k FROM clean)
),
base AS (SELECT COUNT(*) AS n FROM orders)
SELECT CAST(w.n AS BIGINT) AS n_not_in_with_null,
       CAST(wo.n AS BIGINT) AS n_not_in_without_null,
       CAST(b.n AS BIGINT) AS n_orders,
       CAST(w.n = 0 AS BOOLEAN) AS null_trap_fired
FROM with_null w CROSS JOIN without_null wo CROSS JOIN base b
""",
    description="NOT IN three-valued-logic certification: a customer-key "
    "subquery poisoned with NULLs (every 100th key) makes `o_custkey NOT "
    "IN (...)` never-true — the with-NULL branch returns ZERO rows, "
    "which Spark plans as a NullAwareAntiJoin and naive hash anti-joins "
    "get wrong; the null-free rewrite alongside returns the real "
    "complement. Both counts certified cross-engine in one result row, "
    "because the only thing worse than the trap is two engines "
    "disagreeing about it. Plan note: the null-aware branch is the one "
    "anti-join shape that CANNOT use a plain broadcast-anti fast path — "
    "which is exactly why the null-free rewrite belongs in every "
    "migration checklist.",
    tags=("join", "subquery", "sql"),
)
def join_null_aware_anti_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("_naaj_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("_naaj_customer")
    return spark.sql(
        """
WITH poisoned AS (
  SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END AS k
  FROM _naaj_customer
),
clean AS (
  SELECT k FROM poisoned WHERE k IS NOT NULL
),
with_null AS (
  SELECT COUNT(*) AS n FROM _naaj_orders
  WHERE o_custkey NOT IN (SELECT k FROM poisoned)
),
without_null AS (
  SELECT COUNT(*) AS n FROM _naaj_orders
  WHERE o_custkey NOT IN (SELECT k FROM clean)
),
base AS (SELECT COUNT(*) AS n FROM _naaj_orders)
SELECT CAST(w.n AS BIGINT) AS n_not_in_with_null,
       CAST(wo.n AS BIGINT) AS n_not_in_without_null,
       CAST(b.n AS BIGINT) AS n_orders,
       CAST(w.n = 0 AS BOOLEAN) AS null_trap_fired
FROM with_null w CROSS JOIN without_null wo CROSS JOIN base b
"""
    )


_KMAX = 14


@register(
    "events_retention_powerlaw_fit",
    oracle=f"""
WITH firsts AS (
  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS d0
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id,
         epoch_us(e.ts) // 86400000000
           - f.d0 AS k
  FROM events e JOIN firsts f ON f.user_id = e.user_id
),
cohort AS (SELECT COUNT(*) AS n_users FROM firsts),
ret AS (
  SELECT a.k,
         CAST(COUNT(DISTINCT a.user_id) AS DOUBLE) / c.n_users AS r
  FROM activity a CROSS JOIN cohort c
  WHERE a.k BETWEEN 1 AND {_KMAX}
  GROUP BY a.k, c.n_users
),
logs AS (
  SELECT CAST(round(ln(CAST(k AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lx,
         CAST(round(ln(r), 9) AS DECIMAL(18,9)) AS ly
  FROM ret
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(lx) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(ly) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(lx * lx) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(lx * ly) AS VARCHAR) AS DOUBLE) AS sxy
  FROM logs
)
SELECT CAST(n AS BIGINT) AS n_points,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS powerlaw_b,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
         AS powerlaw_ln_a
FROM s
""",
    description=f"Retention power-law fit: day-k retention rates "
    f"(k = 1..{_KMAX}, distinct active users over the cohort) regressed "
    "as ln r = ln a + b·ln k — the curve the growth team fits to decide "
    "whether retention flattens (b near 0) or bleeds (b << 0); the "
    "nonparametric day table is events_retention_cohorts, this is its "
    "parametric summary. Logs are evaluated once per day-k point "
    "(bounded set, 9-dp snapped), the OLS runs on exact decimal sums — "
    "same discipline as the linreg family. Corpus-sized work: one "
    "distinct (user, day-offset) pass.",
    tags=("events", "stats", "forecast"),
)
def events_retention_powerlaw_fit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    ev = t(spark, sf_dir, "events").select("user_id", day.alias("d"))
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", (F.col("d") - F.col("d0")).alias("k"))
        .distinct()
    )
    cohort = firsts.agg(F.count(F.lit(1)).alias("n_users"))
    ret = (
        activity.filter(F.col("k").between(1, _KMAX))
        .crossJoin(F.broadcast(cohort))
        .groupBy("k", "n_users")
        .agg(F.countDistinct("user_id").alias("nk"))
        .select(
            "k",
            (F.col("nk").cast("double") / F.col("n_users")).alias("r"),
        )
    )
    logs = ret.select(
        F.round(F.log(F.col("k").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("lx"),
        F.round(F.log("r"), 9).cast("decimal(18,9)").alias("ly"),
    )
    s = logs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("lx").cast("double").alias("sx"),
        F.sum("ly").cast("double").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast("double").alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast("double").alias("sxy"),
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_points"),
        b.alias("powerlaw_b"),
        ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias(
            "powerlaw_ln_a"
        ),
    )
