"""Seventy-second wave: permutation testing and multi-scale energy.

agg_permutation_test completes the resampling family (events_bootstrap_ci
estimates uncertainty; this tests a hypothesis): the arm labels are
re-drawn B times from md5-derived coin flips, giving an exact-by-
construction null distribution — the test that needs no distributional
assumption at all.  events_haar_energy decomposes the daily series into
dyadic scales (which frequencies carry the variance?) with the unrolled
Haar transform — the multi-scale complement of events_autocorrelation
and agg_hurst_rs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_PT_B = 64  # permutations


@register(
    "agg_permutation_test",
    oracle=f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(round(CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR)
                         AS DOUBLE), 6) AS DECIMAL(12,6)) AS y
  FROM events GROUP BY user_id
), obs AS (
  SELECT CAST(CAST(SUM(y) FILTER (WHERE arm = 1) AS VARCHAR) AS DOUBLE)
           / COUNT(*) FILTER (WHERE arm = 1)
       - CAST(CAST(SUM(y) FILTER (WHERE arm = 0) AS VARCHAR) AS DOUBLE)
           / COUNT(*) FILTER (WHERE arm = 0) AS d,
         COUNT(*) AS n_users
  FROM per_user
), perms AS (
  SELECT b.b, u.y,
         CAST('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '#'
                                 || CAST(b.b AS VARCHAR)), 1, 13) AS BIGINT)
           % 2 AS g
  FROM per_user u, range({_PT_B}) b(b)
), perm_diffs AS (
  SELECT b,
         CAST(CAST(SUM(y) FILTER (WHERE g = 1) AS VARCHAR) AS DOUBLE)
           / COUNT(*) FILTER (WHERE g = 1)
       - CAST(CAST(SUM(y) FILTER (WHERE g = 0) AS VARCHAR) AS DOUBLE)
           / COUNT(*) FILTER (WHERE g = 0) AS d
  FROM perms GROUP BY b
)
SELECT CAST(o.n_users AS BIGINT) AS n_users,
       CAST({_PT_B} AS BIGINT) AS n_permutations,
       round(o.d, 6) AS obs_diff,
       round(CAST(CAST(SUM(CAST(round(abs(p.d), 9) AS DECIMAL(18,9)))
                       AS VARCHAR) AS DOUBLE) / {_PT_B}, 6) AS mean_abs_perm_diff,
       round((1.0 + COUNT(*) FILTER (WHERE round(abs(p.d), 9)
                                           >= round(abs(o.d), 9)))
             / ({_PT_B} + 1.0), 6) AS p_value
FROM perm_diffs p CROSS JOIN obs o
GROUP BY o.n_users, o.d
""",
    description=f"Permutation test of the two-arm mean difference "
    f"({_PT_B} label permutations): each permutation redraws every "
    "user's arm from an md5-derived coin flip — deterministic, so both "
    "engines materialize the IDENTICAL null distribution — and the "
    "p-value is the add-one-smoothed fraction of permuted |diffs| at "
    "least as extreme as the observed one; the assumption-free test "
    "that stays valid when the z-test's normality and the MWU's "
    "continuity both fail (tiny n, lumpy metrics). Comparisons happen "
    "on 9-dp-rounded magnitudes so extremeness ties resolve "
    "identically cross-engine; per-permutation group means flow "
    "through rounded-DECIMAL user totals. Shape: the user x B explode "
    "is the distributed resampling pattern shared with "
    "events_bootstrap_ci — embarrassingly parallel, B-group partial "
    "aggregation, nothing quadratic.",
    tags=("agg", "stats", "experiment", "sampling"),
)
def agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(20,10)")).cast("double"), 6
            )
            .cast("decimal(12,6)")
            .alias("y")
        )
        .select("user_id", (F.col("user_id") % 2).alias("arm"), "y")
    )
    obs = per_user.agg(
        (
            F.sum(F.when(F.col("arm") == 1, F.col("y"))).cast("double")
            / F.count(F.when(F.col("arm") == 1, 1))
            - F.sum(F.when(F.col("arm") == 0, F.col("y"))).cast("double")
            / F.count(F.when(F.col("arm") == 0, 1))
        ).alias("d"),
        F.count(F.lit(1)).alias("n_users"),
    )
    g = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("#"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    perms = per_user.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(_PT_B - 1)))
    ).withColumn("g", g)
    perm_diffs = perms.groupBy("b").agg(
        (
            F.sum(F.when(F.col("g") == 1, F.col("y"))).cast("double")
            / F.count(F.when(F.col("g") == 1, 1))
            - F.sum(F.when(F.col("g") == 0, F.col("y"))).cast("double")
            / F.count(F.when(F.col("g") == 0, 1))
        ).alias("d")
    )
    return (
        perm_diffs.crossJoin(F.broadcast(obs.withColumnRenamed("d", "od")))
        .agg(
            F.first("n_users").cast("bigint").alias("n_users"),
            F.lit(_PT_B).cast("bigint").alias("n_permutations"),
            F.round(F.first("od"), 6).alias("obs_diff"),
            F.round(
                F.sum(F.round(F.abs("d"), 9).cast("decimal(18,9)")).cast("double")
                / _PT_B,
                6,
            ).alias("mean_abs_perm_diff"),
            F.round(
                (
                    F.lit(1.0)
                    + F.count(
                        F.when(
                            F.round(F.abs("d"), 9) >= F.round(F.abs("od"), 9), 1
                        )
                    )
                )
                / (_PT_B + 1.0),
                6,
            ).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# Haar wavelet energy over the first 16 days
# ---------------------------------------------------------------------------

_HW_N = 16  # dyadic window (2^4)
_HW_LEVELS = 4


def _haar_oracle() -> str:
    ctes = [
        f"""l0 AS (
  SELECT idx, v FROM daily WHERE idx < {_HW_N}
)"""
    ]
    for k in range(1, _HW_LEVELS + 1):
        p = k - 1
        ctes.append(f"""a{k} AS (
  SELECT idx // 2 AS idx,
         MAX(CASE WHEN idx % 2 = 0 THEN v END)
           + MAX(CASE WHEN idx % 2 = 1 THEN v END) AS v,
         MAX(CASE WHEN idx % 2 = 0 THEN v END)
           - MAX(CASE WHEN idx % 2 = 1 THEN v END) AS d
  FROM {'l0' if p == 0 else f'a{p}'} GROUP BY idx // 2
), e{k} AS (
  SELECT {k} AS level, COUNT(*) AS n_coeffs,
         CAST(CAST(SUM(CAST(round(d * d, 9) AS DECIMAL(24,9))) AS VARCHAR)
              AS DOUBLE) AS energy
  FROM a{k}
)""")
    unions = " UNION ALL ".join(
        f"SELECT level, n_coeffs, energy FROM e{k}" for k in range(1, _HW_LEVELS + 1)
    )
    return f"""
WITH daily AS (
  SELECT CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS v,
         ROW_NUMBER() OVER (ORDER BY date_trunc('day', ts)) - 1 AS idx
  FROM events GROUP BY date_trunc('day', ts)
),
{','.join(ctes)},
lv AS ({unions}),
tot AS (
  SELECT SUM(energy / pow(2.0, level)) AS scaled_total FROM lv
)
SELECT lv.level, CAST(lv.n_coeffs AS BIGINT) AS n_coeffs,
       round(lv.energy, 6) AS energy,
       round((lv.energy / pow(2.0, lv.level)) / t.scaled_total, 6)
         AS detail_share
FROM lv CROSS JOIN tot t
ORDER BY lv.level
"""


@register(
    "events_haar_energy",
    oracle=_haar_oracle(),
    description=f"Haar wavelet energy decomposition of the daily mean "
    f"series (first {_HW_N} days, {_HW_LEVELS} dyadic levels, "
    "unnormalized (sum, difference) butterflies): each level's detail "
    "energy says how much variation lives at the 2-day / 4-day / "
    "8-day / 16-day scale — the multi-scale decomposition that "
    "separates daily noise from weekly structure in one pass, where "
    "events_autocorrelation probes single lags and agg_hurst_rs fits "
    "one global exponent. detail_share applies the 2^-level Parseval "
    "weights so the shares compare across levels (the exact Parseval "
    "identity against the raw series is asserted by tests). Squared "
    "details are rounded to 9 dp and summed as DECIMAL; the butterfly "
    "at each level is one tiny hash-aggregate on idx//2 — after the "
    "daily pre-aggregate everything runs on ≤16 rows.",
    tags=("events", "timeseries", "stats"),
)
def events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("dd"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
        .select(
            "v", (F.row_number().over(Window.orderBy("dd")) - 1).alias("idx")
        )
        .filter(F.col("idx") < _HW_N)
        .localCheckpoint()
    )
    level_frames = []
    cur = daily
    for k in range(1, _HW_LEVELS + 1):
        nxt = (
            cur.groupBy((F.col("idx") / 2).cast("bigint").alias("idx2"))
            .agg(
                (
                    F.max(F.when(F.col("idx") % 2 == 0, F.col("v")))
                    + F.max(F.when(F.col("idx") % 2 == 1, F.col("v")))
                ).alias("v"),
                (
                    F.max(F.when(F.col("idx") % 2 == 0, F.col("v")))
                    - F.max(F.when(F.col("idx") % 2 == 1, F.col("v")))
                ).alias("d"),
            )
            .withColumnRenamed("idx2", "idx")
            .localCheckpoint()
        )
        level_frames.append(
            nxt.agg(
                F.lit(k).alias("level"),
                F.count(F.lit(1)).alias("n_coeffs"),
                F.sum(F.round(F.col("d") * F.col("d"), 9).cast("decimal(24,9)"))
                .cast("double")
                .alias("energy"),
            )
        )
        cur = nxt.select("idx", "v")
    lv = level_frames[0]
    for fr in level_frames[1:]:
        lv = lv.unionByName(fr)
    tot = lv.agg(
        F.sum(F.col("energy") / F.pow(F.lit(2.0), F.col("level"))).alias(
            "scaled_total"
        )
    )
    return (
        lv.crossJoin(F.broadcast(tot))
        .select(
            "level",
            F.col("n_coeffs").cast("bigint").alias("n_coeffs"),
            F.round("energy", 6).alias("energy"),
            F.round(
                (F.col("energy") / F.pow(F.lit(2.0), F.col("level")))
                / F.col("scaled_total"),
                6,
            ).alias("detail_share"),
        )
        
    )
