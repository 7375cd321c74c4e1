"""Sixty-ninth wave: paired binary testing and the ABC x XYZ grid.

agg_mcnemar_paired fills the paired-data gap in the test family (the
two-sample tests all assume independent groups; month-half conversion of
the SAME user is paired).  orders_abc_xyz_grid is the stocking-policy
deliverable the ABC and XYZ classifications exist for: the 9-cell grid
(value concentration x demand stability) with each cell's part count and
revenue share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# relational_ext6 registers lineitem_abc_classification; plans/__init__
# imports the llm waves first, so pull it in explicitly before composing
from news_ingestion_data_pipeline_spark.plans import relational_ext6  # noqa: F401
from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t


@register(
    "agg_mcnemar_paired",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND day(ts) <= 15
                  THEN 1 ELSE 0 END) AS conv1,
         MAX(CASE WHEN event_type = 'purchase' AND day(ts) > 15
                  THEN 1 ELSE 0 END) AS conv2
  FROM events GROUP BY user_id
), cells AS (
  SELECT COUNT(*) FILTER (WHERE conv1 = 1 AND conv2 = 1) AS both_,
         COUNT(*) FILTER (WHERE conv1 = 1 AND conv2 = 0) AS only_first,
         COUNT(*) FILTER (WHERE conv1 = 0 AND conv2 = 1) AS only_second,
         COUNT(*) FILTER (WHERE conv1 = 0 AND conv2 = 0) AS neither
  FROM per_user
)
SELECT CAST(both_ AS BIGINT) AS both,
       CAST(only_first AS BIGINT) AS only_first,
       CAST(only_second AS BIGINT) AS only_second,
       CAST(neither AS BIGINT) AS neither,
       CASE WHEN only_first + only_second = 0 THEN NULL
            ELSE round(CAST((abs(only_first - only_second) - 1)
                            * (abs(only_first - only_second) - 1) AS DOUBLE)
                       / (only_first + only_second), 6) END
         AS mcnemar_chi2_cc,
       CASE WHEN only_first + only_second = 0 THEN NULL
            ELSE round(CAST(only_second AS DOUBLE)
                       / (only_first + only_second), 6) END
         AS p_second_given_discordant
FROM cells
""",
    description="McNemar's test on paired month-half conversion: each "
    "user contributes a (converted in days 1-15, converted in days "
    "16-31) pair, and the continuity-corrected chi² "
    "(|b−c|−1)²/(b+c) over the DISCORDANT cells tests whether the "
    "marginal conversion rate changed — the paired test the two-sample "
    "family (z, KS, MWU) cannot replace, because the same user appears "
    "in both periods and independent-groups tests would double-count "
    "their idiosyncrasy (exactly the correlation CUPED exploits). The "
    "discordant fraction b/(b+c) rides along as the effect direction. "
    "All exact integer arithmetic until one final division. Shape: one "
    "per-user conditional-max aggregate, one 4-cell frame.",
    tags=("agg", "stats", "experiment"),
)
def agg_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = F.dayofmonth("ts")
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when((F.col("event_type") == "purchase") & (day <= 15), 1).otherwise(0)
            ).alias("conv1"),
            F.max(
                F.when((F.col("event_type") == "purchase") & (day > 15), 1).otherwise(0)
            ).alias("conv2"),
        )
    )
    cells = per_user.agg(
        F.count(F.when((F.col("conv1") == 1) & (F.col("conv2") == 1), 1)).alias("both_"),
        F.count(F.when((F.col("conv1") == 1) & (F.col("conv2") == 0), 1)).alias(
            "only_first"
        ),
        F.count(F.when((F.col("conv1") == 0) & (F.col("conv2") == 1), 1)).alias(
            "only_second"
        ),
        F.count(F.when((F.col("conv1") == 0) & (F.col("conv2") == 0), 1)).alias(
            "neither"
        ),
    )
    disc = F.col("only_first") + F.col("only_second")
    dev = F.abs(F.col("only_first") - F.col("only_second")) - 1
    return cells.select(
        F.col("both_").cast("bigint").alias("both"),
        F.col("only_first").cast("bigint").alias("only_first"),
        F.col("only_second").cast("bigint").alias("only_second"),
        F.col("neither").cast("bigint").alias("neither"),
        F.when(disc == 0, F.lit(None)).otherwise(
            F.round((dev * dev).cast("double") / disc, 6)
        ).alias("mcnemar_chi2_cc"),
        F.when(disc == 0, F.lit(None)).otherwise(
            F.round(F.col("only_second").cast("double") / disc, 6)
        ).alias("p_second_given_discordant"),
    )


# ---------------------------------------------------------------------------
# ABC x XYZ stocking-policy grid
# ---------------------------------------------------------------------------


def _abc_xyz_oracle() -> str:
    abc = REGISTRY["lineitem_abc_classification"].oracle
    return f"""
WITH abc AS ({abc}),
monthly AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY 1, 2
), stats AS (
  SELECT l_partkey, COUNT(*) AS n_months,
         CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(q AS DECIMAL(20,2)) * q) AS VARCHAR) AS DOUBLE) AS ss
  FROM monthly GROUP BY l_partkey
), xyz AS (
  SELECT l_partkey,
         CASE WHEN cv < 0.5 THEN 'X' WHEN cv < 1.0 THEN 'Y' ELSE 'Z' END
           AS xyz_class
  FROM (
    SELECT l_partkey,
           CASE WHEN s = 0 THEN 0
                ELSE sqrt(GREATEST(ss / n_months
                                   - (s / n_months) * (s / n_months), 0))
                     / (s / n_months) END AS cv
    FROM stats WHERE n_months >= 6
  )
), rev_tot AS (
  SELECT SUM(CAST(part_revenue AS DECIMAL(20,6))) AS tot FROM abc
)
SELECT a.abc_class, x.xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(CAST(CAST(SUM(CAST(a.part_revenue AS DECIMAL(20,6))) AS VARCHAR)
                  AS DOUBLE)
             / CAST(CAST(t.tot AS VARCHAR) AS DOUBLE), 6) AS revenue_share,
       CAST(MIN(a.l_partkey) AS BIGINT) AS sample_part
FROM abc a
JOIN xyz x USING (l_partkey)
CROSS JOIN rev_tot t
GROUP BY a.abc_class, x.xyz_class, t.tot
ORDER BY a.abc_class, x.xyz_class
"""


@register(
    "orders_abc_xyz_grid",
    oracle=_abc_xyz_oracle(),
    description="The ABC x XYZ stocking-policy grid — the deliverable "
    "both classifications exist for: every part with ≥6 demand months "
    "lands in one of 9 cells (revenue concentration "
    "lineitem_abc_classification x demand stability "
    "lineitem_xyz_variability, the ABC side reused not re-derived), "
    "each cell reporting its part count and revenue share — AX cells "
    "get tight service levels and automated replenishment, CZ cells "
    "get make-to-order, and the grid's mass distribution is the "
    "one-page summary planners actually read. Revenue shares flow "
    "through DECIMAL sums; the XYZ per-part CV mirrors its registered "
    "construction term for term. Shape: two part-level aggregates "
    "joined on the part domain, one 9-group rollup.",
    tags=("lineitem", "orders", "agg"),
)
def orders_abc_xyz_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    abc = REGISTRY["lineitem_abc_classification"].fn(spark, sf_dir).select(
        "l_partkey", "part_revenue", "abc_class"
    )
    monthly = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", F.date_trunc("month", "l_shipdate").alias("m"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
    )
    stats = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("q").cast("double").alias("s"),
        F.sum(F.col("q").cast("decimal(20,2)") * F.col("q")).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("n_months")
    cv = F.when(F.col("s") == 0, F.lit(0.0)).otherwise(
        F.sqrt(F.greatest(F.col("ss") / F.col("n_months") - mean * mean, F.lit(0.0)))
        / mean
    )
    xyz = (
        stats.filter(F.col("n_months") >= 6)
        .select(
            "l_partkey",
            F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z").alias("xyz_class"),
        )
    )
    rev_tot = abc.agg(
        F.sum(F.col("part_revenue").cast("decimal(20,6)")).alias("tot")
    )
    return (
        abc.join(xyz, "l_partkey")
        .crossJoin(F.broadcast(rev_tot))
        .groupBy("abc_class", "xyz_class", "tot")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.sum(F.col("part_revenue").cast("decimal(20,6)")).cast("double")
                / F.col("tot").cast("double"),
                6,
            ).alias("revenue_share"),
            F.min("l_partkey").cast("bigint").alias("sample_part"),
        )
        .drop("tot")
        
    )
