"""Thirty-seventh wave: revenue growth accounting (the new/resurrected/
expansion/contraction/churn waterfall), Wilson-interval rate ranking
(rank by the lower confidence bound, not the raw rate), and
cluster-balanced deterministic sampling (diversity-preserving corpus
subsets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.llm2 import _sqdist_sql
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "orders_growth_accounting",
    oracle="""
WITH rev AS (
  SELECT o_custkey AS cust,
         EXTRACT(year FROM o_orderdate) * 12
           + EXTRACT(month FROM o_orderdate) AS mid,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
), firsts AS (
  SELECT cust, MIN(mid) AS first_mid FROM rev GROUP BY cust
), pairs AS (
  SELECT COALESCE(c.cust, p.cust) AS cust,
         COALESCE(c.mid, p.mid + 1) AS mid,
         COALESCE(c.cents, 0) AS cur,
         COALESCE(p.cents, 0) AS prv
  FROM rev c
  FULL OUTER JOIN rev p
    ON p.cust = c.cust AND p.mid = c.mid - 1
), tagged AS (
  SELECT pairs.mid,
         CASE WHEN prv = 0 AND f.first_mid = pairs.mid THEN cur ELSE 0 END
           AS new_c,
         CASE WHEN prv = 0 AND f.first_mid < pairs.mid THEN cur ELSE 0 END
           AS res_c,
         CASE WHEN prv > 0 AND cur > prv THEN cur - prv ELSE 0 END AS exp_c,
         CASE WHEN prv > 0 AND cur > 0 AND cur < prv THEN cur - prv
              ELSE 0 END AS con_c,
         CASE WHEN cur = 0 THEN -prv ELSE 0 END AS chu_c
  FROM pairs JOIN firsts f ON f.cust = pairs.cust
  WHERE cur > 0 OR prv > 0
)
SELECT CAST(mid // 12 AS INT) AS yr, CAST(mid % 12 AS INT) AS mo,
       SUM(new_c) / 100.0 AS new_rev,
       SUM(res_c) / 100.0 AS resurrected_rev,
       SUM(exp_c) / 100.0 AS expansion_rev,
       SUM(con_c) / 100.0 AS contraction_rev,
       SUM(chu_c) / 100.0 AS churned_rev,
       (SUM(new_c) + SUM(res_c) + SUM(exp_c) + SUM(con_c) + SUM(chu_c))
         / 100.0 AS net_change
FROM tagged
GROUP BY mid
ORDER BY yr, mo
""",
    description="Revenue growth accounting (the SaaS waterfall): each "
    "month's revenue change decomposed into NEW (first-ever month), "
    "RESURRECTED (returning after a gap), EXPANSION / CONTRACTION "
    "(actives spending more / less than last month), and CHURNED (last "
    "month's spend that vanished) — the identity net_change = new + res "
    "+ exp + con + chu holds exactly because revenue is carried as "
    "integer CENTS end to end (no float in any bucket). Built from one "
    "(customer, month) aggregate, a self full-outer join on the "
    "adjacent-month key (shuffle on customer — at 100 TB this is one "
    "co-partitioned join, both sides already hashed by customer), and a "
    "month rollup.",
    tags=("agg", "events", "pipeline"),
)
def orders_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("cust"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mid"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    firsts = rev.groupBy("cust").agg(F.min("mid").alias("first_mid"))
    c = rev.select("cust", "mid", F.col("cents").alias("cur"))
    p = rev.select(
        F.col("cust").alias("pcust"),
        (F.col("mid") + 1).alias("pmid"),
        F.col("cents").alias("prv"),
    )
    pairs = (
        c.join(
            p,
            (F.col("cust") == F.col("pcust")) & (F.col("mid") == F.col("pmid")),
            "full_outer",
        )
        .select(
            F.coalesce("cust", "pcust").alias("cust"),
            F.coalesce("mid", "pmid").alias("mid"),
            F.coalesce("cur", F.lit(0)).alias("cur"),
            F.coalesce("prv", F.lit(0)).alias("prv"),
        )
    )
    tagged = pairs.join(firsts, "cust").where(
        (F.col("cur") > 0) | (F.col("prv") > 0)
    )
    new_c = F.when(
        (F.col("prv") == 0) & (F.col("first_mid") == F.col("mid")), F.col("cur")
    ).otherwise(0)
    res_c = F.when(
        (F.col("prv") == 0) & (F.col("first_mid") < F.col("mid")), F.col("cur")
    ).otherwise(0)
    exp_c = F.when(
        (F.col("prv") > 0) & (F.col("cur") > F.col("prv")),
        F.col("cur") - F.col("prv"),
    ).otherwise(0)
    con_c = F.when(
        (F.col("prv") > 0) & (F.col("cur") > 0) & (F.col("cur") < F.col("prv")),
        F.col("cur") - F.col("prv"),
    ).otherwise(0)
    chu_c = F.when(F.col("cur") == 0, -F.col("prv")).otherwise(0)
    agg = tagged.groupBy("mid").agg(
        F.sum(new_c).alias("n"),
        F.sum(res_c).alias("r"),
        F.sum(exp_c).alias("e"),
        F.sum(con_c).alias("co"),
        F.sum(chu_c).alias("ch"),
    )
    return agg.select(
        F.expr("mid div 12").cast("int").alias("yr"),
        (F.col("mid") % 12).cast("int").alias("mo"),
        (F.col("n") / 100.0).alias("new_rev"),
        (F.col("r") / 100.0).alias("resurrected_rev"),
        (F.col("e") / 100.0).alias("expansion_rev"),
        (F.col("co") / 100.0).alias("contraction_rev"),
        (F.col("ch") / 100.0).alias("churned_rev"),
        (
            (F.col("n") + F.col("r") + F.col("e") + F.col("co") + F.col("ch"))
            / 100.0
        ).alias("net_change"),
    )


_Z = 1.959963984540054  # 97.5th normal quantile (95% two-sided)


@register(
    "events_rate_wilson",
    oracle=f"""
WITH chan AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE event_type IN ('view', 'click', 'signup')
), buyers AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
), counts AS (
  SELECT c.event_type AS channel,
         COUNT(*) AS n,
         SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS x
  FROM chan c LEFT JOIN buyers b ON b.user_id = c.user_id
  GROUP BY c.event_type
), wil AS (
  SELECT channel, n, x,
         CAST(x AS DOUBLE) / n AS p,
         {_Z} AS z
  FROM counts
)
SELECT channel, CAST(n AS BIGINT) AS n_users, CAST(x AS BIGINT) AS n_converted,
       round(p, 6) AS rate,
       round((p + z*z/(2*n) - z * sqrt(p*(1-p)/n + z*z/(4.0*n*n)))
             / (1 + z*z/n), 6) AS wilson_lower,
       round((p + z*z/(2*n) + z * sqrt(p*(1-p)/n + z*z/(4.0*n*n)))
             / (1 + z*z/n), 6) AS wilson_upper
FROM wil
ORDER BY wilson_lower DESC, channel
""",
    description="Conversion-rate ranking by the Wilson score interval: "
    "per acquisition channel, the share of its users who ever purchased, "
    "with the 95% Wilson lower/upper bounds — and the ORDER BY is the "
    "LOWER bound, the estimator that stops a 2/2 = 100% channel from "
    "outranking a 900/1000 = 90% one (the rate-ranking-under-"
    "uncertainty trick). All inputs are exact distinct-user counts; the "
    "interval is one closed-form IEEE expression both engines evaluate "
    "identically. Two distinct aggregates + a broadcast-sized left join; "
    "constant output.",
    tags=("events", "stats"),
)
def events_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    chan = (
        ev.where(F.col("event_type").isin("view", "click", "signup"))
        .select("user_id", "event_type")
        .distinct()
    )
    buyers = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("bought", F.lit(1))
    )
    counts = (
        chan.join(F.broadcast(buyers), "user_id", "left")
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("bought", F.lit(0))).alias("x"),
        )
    )
    p = F.col("x").cast("double") / F.col("n")
    z = F.lit(_Z)
    n = F.col("n")
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return counts.select(
        "channel",
        n.cast("bigint").alias("n_users"),
        F.col("x").cast("bigint").alias("n_converted"),
        F.round(p, 6).alias("rate"),
        F.round((p + z * z / (2 * n) - half) / denom, 6).alias("wilson_lower"),
        F.round((p + z * z / (2 * n) + half) / denom, 6).alias("wilson_upper"),
    )


_CBS_K = 10


@register(
    "curation_cluster_balanced_sample",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT e.vec_id, cent.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sqdist_sql('e.v', 'cent.cv', 64)},
                              cent.cent_id) AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
), ranked AS (
  SELECT cell, vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY cell
           ORDER BY md5('cbs:' || CAST(vec_id AS VARCHAR)), vec_id) AS rk,
         COUNT(*) OVER (PARTITION BY cell) AS n_cell
  FROM assigned
)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(MAX(n_cell) AS BIGINT) AS n_cell,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(vec_id) AS BIGINT) AS sampled_id_sum
FROM ranked WHERE rk <= {_CBS_K}
GROUP BY cell
ORDER BY cell
""",
    description=f"Cluster-balanced sampling: assign every embedding to "
    "its nearest seeded centroid (the sim_kmeans_assign partition), then "
    f"take exactly {_CBS_K} per cell by md5-hash order — a deterministic, "
    "seedless, RESTARTABLE diversity sample that guarantees every "
    "semantic region is represented, where uniform sampling "
    "oversamples the dominant cluster (the corpus-mixing failure "
    "SemDeDup papers warn about). The md5 rank is a pure function of "
    "the id, so the sample is stable under corpus growth within a cell. "
    "Output fingerprints each cell's sample (count + id-sum — integer-"
    "exact, certifying the exact member set). Broadcast centroids, one "
    "argmin pass, one per-cell top-K window on md5 keys.",
    tags=("curation", "llm", "sampling"),
)
def curation_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    d = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "cent_id", d.alias("d"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cent_id")).alias("m"))
        .select("vec_id", F.col("m.cent_id").alias("cell"))
    )
    wc = Window.partitionBy("cell")
    wr = wc.orderBy(
        F.md5(F.concat(F.lit("cbs:"), F.col("vec_id").cast("string"))), "vec_id"
    )
    ranked = assigned.select(
        "cell",
        "vec_id",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n_cell"),
    )
    return (
        ranked.where(F.col("rk") <= _CBS_K)
        .groupBy(F.col("cell").cast("bigint").alias("cell"))
        .agg(
            F.max("n_cell").cast("bigint").alias("n_cell"),
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum("vec_id").cast("bigint").alias("sampled_id_sum"),
        )
        
    )
