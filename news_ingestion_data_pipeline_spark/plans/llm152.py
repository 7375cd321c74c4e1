"""Hundred-fifty-second wave: ordinal and nominal association —
Goodman-Kruskal gamma and Cramer's V.

  * agg_goodman_kruskal_gamma — ordinal-vs-ordinal association
    (priority rank x order-value decile): concordant and discordant
    pair counts computed EXACTLY from the 5x10 contingency table
    (each cell pairs with the strictly-greater-in-both quadrant — a
    bounded 50x50 double sum, never a row-pair join), gamma =
    (C - D)/(C + D).
  * agg_cramers_v — nominal-vs-nominal strength (priority x market
    segment): chi-square over the 25-cell table with 9-dp-snapped
    cell terms, V = sqrt(chi2 / (n·(min(r,c)-1))) — the bounded
    [0,1] association number the raw chi-square (which grows with n)
    cannot give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "agg_goodman_kruskal_gamma",
    oracle="""
WITH cells AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr,
         LEAST(CAST(floor(o_totalprice) AS BIGINT) // 50000, 9) AS vd,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.n AS na, b.n AS nb,
         CASE WHEN (a.pr < b.pr AND a.vd < b.vd)
                OR (a.pr > b.pr AND a.vd > b.vd) THEN 'c'
              WHEN (a.pr < b.pr AND a.vd > b.vd)
                OR (a.pr > b.pr AND a.vd < b.vd) THEN 'd'
              ELSE 't' END AS kind
  FROM cells a JOIN cells b
    ON a.pr < b.pr OR (a.pr = b.pr AND a.vd < b.vd)
),
counts AS (
  SELECT SUM(CASE WHEN kind = 'c' THEN na * nb ELSE 0 END) AS c,
         SUM(CASE WHEN kind = 'd' THEN na * nb ELSE 0 END) AS d
  FROM pairs
)
SELECT CAST(c AS BIGINT) AS concordant,
       CAST(d AS BIGINT) AS discordant,
       CAST(c - d AS DOUBLE) / (c + d) AS gk_gamma
FROM counts
""",
    description="Goodman-Kruskal gamma between order priority rank and "
    "the 50k-wide order-value decile: concordant/discordant pair counts "
    "computed EXACTLY from the 5x10 contingency table — every ordered "
    "cell pair classifies as concordant, discordant or tied, and "
    "contributes na*nb pairs, so the statistic over millions of row "
    "pairs costs a bounded 50x50 cell join. gamma = (C-D)/(C+D) ignores "
    "ties by definition (Kendall tau-b, already shipped, penalizes "
    "them). All-integer until one division. The contingency table is "
    "the only corpus-sized aggregate.",
    tags=("agg", "stats"),
)
def agg_goodman_kruskal_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    conc = (F.col("a.pr") < F.col("b.pr")) & (F.col("a.vd") < F.col("b.vd"))
    conc2 = (F.col("a.pr") > F.col("b.pr")) & (F.col("a.vd") > F.col("b.vd"))
    disc = (F.col("a.pr") < F.col("b.pr")) & (F.col("a.vd") > F.col("b.vd"))
    disc2 = (F.col("a.pr") > F.col("b.pr")) & (F.col("a.vd") < F.col("b.vd"))
    pairs = a.join(
        b,
        (F.col("a.pr") < F.col("b.pr"))
        | ((F.col("a.pr") == F.col("b.pr")) & (F.col("a.vd") < F.col("b.vd"))),
    ).select(
        (F.col("a.n") * F.col("b.n")).alias("np"),
        F.when(conc | conc2, "c").when(disc | disc2, "d").otherwise("t").alias(
            "kind"
        ),
    )
    counts = pairs.agg(
        F.sum(F.when(F.col("kind") == "c", F.col("np")).otherwise(0)).alias(
            "c"
        ),
        F.sum(F.when(F.col("kind") == "d", F.col("np")).otherwise(0)).alias(
            "d"
        ),
    )
    return counts.select(
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        (
            (F.col("c") - F.col("d")).cast("double") / (F.col("c") + F.col("d"))
        ).alias("gk_gamma"),
    )


@register(
    "agg_cramers_v",
    oracle="""
WITH obs AS (
  SELECT o.o_orderpriority AS pr, c.c_mktsegment AS seg, COUNT(*) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
marg AS (
  SELECT pr, SUM(n) AS n_pr FROM obs GROUP BY pr
),
marg2 AS (
  SELECT seg, SUM(n) AS n_seg FROM obs GROUP BY seg
),
tot AS (SELECT SUM(n) AS n FROM obs),
grid AS (
  SELECT m.pr, m2.seg, m.n_pr, m2.n_seg, t.n
  FROM marg m CROSS JOIN marg2 m2 CROSS JOIN tot t
),
chi AS (
  SELECT SUM(CAST(round(
           (COALESCE(o.n, 0) - CAST(g.n_pr AS DOUBLE) * g.n_seg / g.n)
           * (COALESCE(o.n, 0) - CAST(g.n_pr AS DOUBLE) * g.n_seg / g.n)
           / (CAST(g.n_pr AS DOUBLE) * g.n_seg / g.n), 9)
           AS DECIMAL(28,9))) AS chi9,
         MAX(g.n) AS n,
         COUNT(DISTINCT g.pr) AS r,
         COUNT(DISTINCT g.seg) AS c
  FROM grid g LEFT JOIN obs o ON o.pr = g.pr AND o.seg = g.seg
)
SELECT CAST(n AS BIGINT) AS n_total,
       CAST(CAST(chi9 AS VARCHAR) AS DOUBLE) AS chi2,
       sqrt(CAST(CAST(chi9 AS VARCHAR) AS DOUBLE)
            / (n * (LEAST(r, c) - 1.0))) AS cramers_v
FROM chi
""",
    description="Cramer's V between order priority and customer market "
    "segment: chi-square over the 25-cell contingency table (expected "
    "counts from the marginals, each cell term snapped to 9-dp decimals "
    "before the exact sum), normalized to V = sqrt(chi2/(n·(min(r,c)-1))) "
    "— the [0,1] association strength that is comparable across table "
    "sizes where raw chi-square (agg_chi_square_independence) scales "
    "with n. One join + one grouped count is the only corpus-sized work; "
    "the game solves on 25 rows.",
    tags=("agg", "stats"),
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("o_orderpriority").alias("pr"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # marginals and cells both read it
    )
    marg = obs.groupBy("pr").agg(F.sum("n").alias("n_pr"))
    marg2 = obs.groupBy("seg").agg(F.sum("n").alias("n_seg"))
    tot = obs.agg(F.sum("n").alias("nt"))
    grid = marg.crossJoin(F.broadcast(marg2)).crossJoin(F.broadcast(tot))
    e = F.col("n_pr").cast("double") * F.col("n_seg") / F.col("nt")
    cells = grid.join(obs, ["pr", "seg"], "left").select(
        "pr",
        "seg",
        "nt",
        F.round(
            (F.coalesce("n", F.lit(0)) - e)
            * (F.coalesce("n", F.lit(0)) - e)
            / e,
            9,
        )
        .cast("decimal(28,9)")
        .alias("cell9"),
    )
    chi = cells.agg(
        F.sum("cell9").alias("chi9"),
        F.max("nt").alias("n"),
        F.countDistinct("pr").alias("r"),
        F.countDistinct("seg").alias("c"),
    )
    chi2 = F.col("chi9").cast("double")
    return chi.select(
        F.col("n").cast("bigint").alias("n_total"),
        chi2.alias("chi2"),
        F.sqrt(
            chi2 / (F.col("n") * (F.least("r", "c").cast("double") - 1.0))
        ).alias("cramers_v"),
    )
