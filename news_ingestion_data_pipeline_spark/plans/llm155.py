"""Hundred-fifty-fifth wave: Somers' D and Kendall tau-c — completing
the ordinal-association family.

Goodman-Kruskal gamma (wave 152) ignores ties entirely; the two
measures practitioners actually reach for when ties matter are:

  * agg_somers_d — the ASYMMETRIC measure (D_y|x penalizes ties on the
    dependent variable only): the statistic behind the AUC identity
    (D = 2·AUC − 1) and ordinal regression diagnostics.
  * agg_kendall_tau_c — Stuart's tau-c, the correction for RECTANGULAR
    tables (5 priorities x 10 deciles) where tau-b's geometric-mean
    denominator can't reach ±1.

Both compute from the SAME bounded 5x10 contingency table as gamma —
concordant/discordant/tied-pair counts are exact integers, one
division at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_CELLS_SQL = """cells AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr,
         LEAST(CAST(floor(o_totalprice) AS BIGINT) // 50000, 9) AS vd,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.n * b.n AS np,
         CASE WHEN (a.pr < b.pr AND a.vd < b.vd)
                OR (a.pr > b.pr AND a.vd > b.vd) THEN 'c'
              WHEN (a.pr < b.pr AND a.vd > b.vd)
                OR (a.pr > b.pr AND a.vd < b.vd) THEN 'd'
              WHEN a.pr = b.pr AND a.vd <> b.vd THEN 'tx'
              WHEN a.pr <> b.pr AND a.vd = b.vd THEN 'ty'
              ELSE 'txy' END AS kind
  FROM cells a JOIN cells b
    ON a.pr < b.pr OR (a.pr = b.pr AND a.vd < b.vd)
),
counts AS (
  SELECT SUM(CASE WHEN kind = 'c' THEN np ELSE 0 END) AS c,
         SUM(CASE WHEN kind = 'd' THEN np ELSE 0 END) AS d,
         SUM(CASE WHEN kind = 'tx' THEN np ELSE 0 END) AS tx,
         SUM(CASE WHEN kind = 'ty' THEN np ELSE 0 END) AS ty
  FROM pairs
),
tot AS (SELECT SUM(n) AS n FROM cells)"""


@register(
    "agg_somers_d",
    oracle=f"""
WITH {_CELLS_SQL}
SELECT CAST(c.c AS BIGINT) AS concordant,
       CAST(c.d AS BIGINT) AS discordant,
       CAST(c.ty AS BIGINT) AS ties_value_only,
       CAST(c.c - c.d AS DOUBLE) / (c.c + c.d + c.ty) AS somers_d
FROM counts c
""",
    description="Somers' D of order-value decile on priority rank "
    "(D_value|priority): (C - D) / (C + D + T_value), where pairs tied "
    "on the DEPENDENT value only enter the denominator — the asymmetric "
    "ordinal measure behind the AUC identity D = 2·AUC - 1 and ordinal "
    "model diagnostics (gamma, wave 152, drops all ties; tau-b, already "
    "shipped, penalizes both sides). Pair classes count exactly from "
    "the bounded 5x10 contingency table — millions of row pairs, fifty "
    "cells, one integer division at the end.",
    tags=("agg", "stats"),
)
def agg_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _pair_counts(spark, sf_dir)
    return counts.select(
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        F.col("ty").cast("bigint").alias("ties_value_only"),
        (
            (F.col("c") - F.col("d")).cast("double")
            / (F.col("c") + F.col("d") + F.col("ty"))
        ).alias("somers_d"),
    )


@register(
    "agg_kendall_tau_c",
    oracle=f"""
WITH {_CELLS_SQL}
SELECT CAST(c.c AS BIGINT) AS concordant,
       CAST(c.d AS BIGINT) AS discordant,
       CAST(t.n AS BIGINT) AS n_total,
       2.0 * 5.0 * CAST(c.c - c.d AS DOUBLE)
         / (CAST(t.n AS DOUBLE) * t.n * (5.0 - 1.0)) AS tau_c
FROM counts c CROSS JOIN tot t
""",
    description="Stuart's tau-c between priority rank and the order-value "
    "decile: 2m(C-D)/(n²(m-1)) with m = min(rows, cols) = 5 — the "
    "rectangular-table correction that lets the statistic reach ±1 where "
    "tau-b's geometric-mean denominator (agg_kendall_tau) cannot on a "
    "5x10 table. Same exact pair-count machinery as gamma/Somers: the "
    "bounded contingency table replaces the quadratic pair join, integer "
    "arithmetic until one closing division.",
    tags=("agg", "stats"),
)
def agg_kendall_tau_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _pair_counts(spark, sf_dir)
    n_tot = (
        t(spark, sf_dir, "orders").count()
    )  # plan constant: table size
    return counts.select(
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        F.lit(n_tot).cast("bigint").alias("n_total"),
        (
            2.0
            * 5.0
            * (F.col("c") - F.col("d")).cast("double")
            / (float(n_tot) * float(n_tot) * 4.0)
        ).alias("tau_c"),
    )


def _pair_counts(spark: SparkSession, sf_dir: str):
    cells = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("pr"),
            F.least(
                F.expr("CAST(floor(o_totalprice) AS BIGINT) div 50000"), F.lit(9)
            ).alias("vd"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # both pair sides
    )
    a, b = cells.alias("a"), cells.alias("b")
    conc = (
        (F.col("a.pr") < F.col("b.pr")) & (F.col("a.vd") < F.col("b.vd"))
    ) | ((F.col("a.pr") > F.col("b.pr")) & (F.col("a.vd") > F.col("b.vd")))
    disc = (
        (F.col("a.pr") < F.col("b.pr")) & (F.col("a.vd") > F.col("b.vd"))
    ) | ((F.col("a.pr") > F.col("b.pr")) & (F.col("a.vd") < F.col("b.vd")))
    tx = (F.col("a.pr") == F.col("b.pr")) & (F.col("a.vd") != F.col("b.vd"))
    ty = (F.col("a.pr") != F.col("b.pr")) & (F.col("a.vd") == F.col("b.vd"))
    pairs = a.join(
        b,
        (F.col("a.pr") < F.col("b.pr"))
        | ((F.col("a.pr") == F.col("b.pr")) & (F.col("a.vd") < F.col("b.vd"))),
    ).select(
        (F.col("a.n") * F.col("b.n")).alias("np"),
        F.when(conc, "c")
        .when(disc, "d")
        .when(tx, "tx")
        .when(ty, "ty")
        .otherwise("txy")
        .alias("kind"),
    )
    return pairs.agg(
        F.sum(F.when(F.col("kind") == "c", F.col("np")).otherwise(0)).alias(
            "c"
        ),
        F.sum(F.when(F.col("kind") == "d", F.col("np")).otherwise(0)).alias(
            "d"
        ),
        F.sum(F.when(F.col("kind") == "tx", F.col("np")).otherwise(0)).alias(
            "tx"
        ),
        F.sum(F.when(F.col("kind") == "ty", F.col("np")).otherwise(0)).alias(
            "ty"
        ),
    )
