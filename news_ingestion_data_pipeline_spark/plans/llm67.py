"""Sixty-seventh wave: exact apportionment and Fisher's exact test.

curation_epoch_apportionment turns the temperature-scaled mixture weights
into an integer per-source document budget with the largest-remainder
(Hamilton) method — the deterministic rounding every sampler needs so
per-source quotas sum EXACTLY to the epoch budget.
agg_fisher_exact_2x2 is the small-sample categorical test (the chi-square
approximation's exact sibling), computed entirely in-engine from a
log-factorial prefix table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_EA_BUDGET = 10_000  # documents per epoch
_EA_TAU = 0.7


@register(
    "curation_epoch_apportionment",
    oracle=f"""
WITH src AS (
  SELECT source, SUM(n_chars) AS mass FROM documents GROUP BY source
), powed AS (
  SELECT source,
         CAST(round(pow(CAST(mass AS DOUBLE), {_EA_TAU!r}), 9)
              AS DECIMAL(28,9)) AS p
  FROM src
), tot AS (SELECT SUM(p) AS sp FROM powed),
quota AS (
  SELECT source,
         CAST(CAST(p AS VARCHAR) AS DOUBLE)
           / CAST(CAST(t.sp AS VARCHAR) AS DOUBLE) * {_EA_BUDGET} AS q
  FROM powed CROSS JOIN tot t
), floored AS (
  SELECT source, q, CAST(floor(q) AS BIGINT) AS base,
         q - floor(q) AS frac
  FROM quota
), short AS (
  SELECT {_EA_BUDGET} - SUM(base) AS missing FROM floored
), ranked AS (
  SELECT source, q, base, frac,
         ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS rn
  FROM floored
)
SELECT r.source,
       round(r.q, 6) AS exact_quota,
       CAST(r.base + CASE WHEN r.rn <= s.missing THEN 1 ELSE 0 END AS BIGINT)
         AS n_docs_budget,
       CAST(r.rn <= s.missing AS BOOLEAN) AS got_remainder
FROM ranked r CROSS JOIN short s
ORDER BY r.source
""",
    description=f"Largest-remainder (Hamilton) apportionment of a "
    f"{_EA_BUDGET}-document epoch budget across sources under the "
    f"temperature-τ={_EA_TAU} mixture weights "
    "(curation_mixture_temperature's rule): exact quotas are floored "
    "and the missing units go to the largest fractional remainders "
    "((frac desc, source) total order) — the deterministic rounding "
    "that makes per-source budgets sum EXACTLY to the epoch size, "
    "which naive per-source rounding never guarantees (and a sampler "
    "that is off by even one document breaks resumable epoch "
    "bookkeeping, curation_epoch_shuffle's contract). Shape: "
    "everything after the per-source mass aggregate runs on the "
    "20-row source domain; the apportionment itself is one rank "
    "over sources.",
    tags=("curation", "llm", "sampling"),
)
def curation_epoch_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").alias("mass"))
    )
    powed = src.select(
        "source",
        F.round(F.pow(F.col("mass").cast("double"), F.lit(_EA_TAU)), 9)
        .cast("decimal(28,9)")
        .alias("p"),
    )
    tot = powed.agg(F.sum("p").alias("sp"))
    quota = powed.crossJoin(F.broadcast(tot)).select(
        "source",
        (
            F.col("p").cast("double") / F.col("sp").cast("double") * _EA_BUDGET
        ).alias("q"),
    )
    floored = quota.select(
        "source",
        "q",
        F.floor("q").cast("bigint").alias("base"),
        (F.col("q") - F.floor("q")).alias("frac"),
    )
    short = floored.agg((F.lit(_EA_BUDGET) - F.sum("base")).alias("missing"))
    ranked = floored.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("frac").desc(), F.col("source")))
    )
    return (
        ranked.crossJoin(F.broadcast(short))
        .select(
            "source",
            F.round("q", 6).alias("exact_quota"),
            (
                F.col("base")
                + F.when(F.col("rn") <= F.col("missing"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_docs_budget"),
            (F.col("rn") <= F.col("missing")).alias("got_remainder"),
        )
        
    )


# ---------------------------------------------------------------------------
# Fisher's exact test on the arm x converted 2x2 table
# ---------------------------------------------------------------------------


@register(
    "agg_fisher_exact_2x2",
    oracle="""
WITH users AS (
  SELECT user_id % 2 AS arm,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
           AS conv
  FROM events GROUP BY user_id
), cell AS (
  SELECT COUNT(*) FILTER (WHERE arm = 1 AND conv = 1) AS a,
         COUNT(*) FILTER (WHERE arm = 1 AND conv = 0) AS b,
         COUNT(*) FILTER (WHERE arm = 0 AND conv = 1) AS c,
         COUNT(*) FILTER (WHERE arm = 0 AND conv = 0) AS d
  FROM users
), lf AS (  -- log-factorial prefix table over the bounded 0..n domain
  SELECT i,
         SUM(CAST(round(ln(GREATEST(i, 1)), 9) AS DECIMAL(18,9)))
           OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS lfac
  FROM (SELECT UNNEST(range(0, (SELECT a + b + c + d + 1 FROM cell))) AS i)
), lfd AS (
  SELECT i, CAST(CAST(lfac AS VARCHAR) AS DOUBLE) AS lf FROM lf
), tables_ AS (
  SELECT k.k,
         (SELECT lf FROM lfd WHERE i = c.a + c.b)
       + (SELECT lf FROM lfd WHERE i = c.c + c.d)
       + (SELECT lf FROM lfd WHERE i = c.a + c.c)
       + (SELECT lf FROM lfd WHERE i = c.b + c.d)
       - (SELECT lf FROM lfd WHERE i = c.a + c.b + c.c + c.d)
       - (SELECT lf FROM lfd WHERE i = k.k)
       - (SELECT lf FROM lfd WHERE i = c.a + c.b - k.k)
       - (SELECT lf FROM lfd WHERE i = c.a + c.c - k.k)
       - (SELECT lf FROM lfd WHERE i = c.d - c.a + k.k) AS logp
  FROM cell c,
       LATERAL (SELECT UNNEST(range(GREATEST(0, c.a - c.d),
                                    LEAST(c.a + c.b, c.a + c.c) + 1)) AS k) k
), obs AS (
  SELECT logp AS logp_obs FROM tables_, cell WHERE k = cell.a
)
SELECT CAST(c.a AS BIGINT) AS a, CAST(c.b AS BIGINT) AS b,
       CAST(c.c AS BIGINT) AS c, CAST(c.d AS BIGINT) AS d,
       round(exp(o.logp_obs), 9) AS p_observed_table,
       round((SELECT CAST(CAST(SUM(CAST(round(exp(logp), 12) AS DECIMAL(14,12)))
                          AS VARCHAR) AS DOUBLE)
              FROM tables_ WHERE round(logp, 9) <= round(o.logp_obs, 9)), 6)
         AS p_two_sided
FROM cell c CROSS JOIN obs o
""",
    description="Fisher's exact test on the (arm x converted) 2x2 user "
    "table — the small-sample exact sibling of "
    "agg_chi_square_independence, and the test reviewers ask for when "
    "any expected cell is small. Computed entirely in-engine: a "
    "log-factorial prefix table over the bounded 0..n integer domain "
    "(ln per integer, rounded to 9 dp, exact DECIMAL prefix sums — "
    "the engine's libm contract), hypergeometric log-probabilities "
    "for every admissible table, and the two-sided p as the sum of "
    "probabilities of tables no more likely than the observed one "
    "(the 'probability method', scipy's definition), with exp values "
    "rounded to 12 dp and summed as DECIMAL so the tail sum is "
    "partition-order-independent. Shape: one per-user aggregate, one "
    "4-cell frame, then everything runs on the ~n-row support domain "
    "— the test costs nothing beyond the scan at any scale.",
    tags=("agg", "stats", "experiment"),
)
def agg_fisher_exact_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .select((F.col("user_id") % 2).alias("arm"), "conv")
    )
    cell = users.agg(
        F.count(F.when((F.col("arm") == 1) & (F.col("conv") == 1), 1)).alias("a"),
        F.count(F.when((F.col("arm") == 1) & (F.col("conv") == 0), 1)).alias("b"),
        F.count(F.when((F.col("arm") == 0) & (F.col("conv") == 1), 1)).alias("c"),
        F.count(F.when((F.col("arm") == 0) & (F.col("conv") == 0), 1)).alias("d"),
    ).localCheckpoint()
    # The log-factorial ladder generates 0..n DISTRIBUTED (spark.range,
    # never a single-row sequence-explode) and takes its exact decimal
    # prefix sum via the two-pass bucketed form (operators/ranking.py) —
    # the only driver-side value is the 4-cell total, a 1-row scalar
    # read off the already-materialized localCheckpoint.
    n_val = int(
        cell.select(
            (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("n")
        ).first()["n"]
    )
    rng = spark.range(0, n_val + 1, 1, 32).select(F.col("id").alias("i"))
    lf = (
        RK.distributed_prefix_sum(
            rng.withColumn(
                "lterm",
                F.round(
                    F.log(F.greatest(F.col("i"), F.lit(1)).cast("double")), 9
                ).cast("decimal(18,9)"),
            ),
            ["i"],
            F.floor(F.col("i") * 256 / F.lit(n_val + 1)),
            ["lterm"],
            inclusive=True,
        )
        .select("i", F.col("cum_lterm").cast("double").alias("lf"))
        .localCheckpoint()
    )

    # join helper: attach lf value for a computed index column
    def with_lf(df, idx_col, out_name):
        lfr = lf.select(
            F.col("i").alias(f"_i_{out_name}"), F.col("lf").alias(out_name)
        )
        return df.join(
            F.broadcast(lfr), idx_col == F.col(f"_i_{out_name}")
        ).drop(f"_i_{out_name}")

    ks = cell.select(
        "a",
        "b",
        "c",
        "d",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), F.col("a") - F.col("d")),
                F.least(F.col("a") + F.col("b"), F.col("a") + F.col("c")),
            )
        ).alias("k"),
    )
    tbl = ks
    for idx, name in [
        (F.col("a") + F.col("b"), "l_r1"),
        (F.col("c") + F.col("d"), "l_r2"),
        (F.col("a") + F.col("c"), "l_c1"),
        (F.col("b") + F.col("d"), "l_c2"),
        (F.col("a") + F.col("b") + F.col("c") + F.col("d"), "l_n"),
        (F.col("k"), "l_k"),
        (F.col("a") + F.col("b") - F.col("k"), "l_r1k"),
        (F.col("a") + F.col("c") - F.col("k"), "l_c1k"),
        (F.col("d") - F.col("a") + F.col("k"), "l_dk"),
    ]:
        tbl = with_lf(tbl, idx, name)
    logp = (
        F.col("l_r1")
        + F.col("l_r2")
        + F.col("l_c1")
        + F.col("l_c2")
        - F.col("l_n")
        - F.col("l_k")
        - F.col("l_r1k")
        - F.col("l_c1k")
        - F.col("l_dk")
    )
    tables_ = tbl.select("a", "b", "c", "d", "k", logp.alias("logp")).localCheckpoint()
    obs = tables_.filter(F.col("k") == F.col("a")).select(
        F.col("logp").alias("logp_obs")
    )
    tail = (
        tables_.crossJoin(F.broadcast(obs))
        .filter(F.round("logp", 9) <= F.round("logp_obs", 9))
        .agg(
            F.sum(F.round(F.exp("logp"), 12).cast("decimal(14,12)"))
            .cast("double")
            .alias("p2")
        )
    )
    return (
        cell.crossJoin(F.broadcast(obs))
        .crossJoin(F.broadcast(tail))
        .select(
            F.col("a").cast("bigint").alias("a"),
            F.col("b").cast("bigint").alias("b"),
            F.col("c").cast("bigint").alias("c"),
            F.col("d").cast("bigint").alias("d"),
            F.round(F.exp("logp_obs"), 9).alias("p_observed_table"),
            F.round("p2", 6).alias("p_two_sided"),
        )
    )
