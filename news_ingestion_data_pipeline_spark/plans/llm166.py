"""Hundred-sixty-sixth wave: DDSketch — the relative-error quantile
sketch (Masson, Rim & Lee, VLDB 2019).

Fixed-size quantile sketches with RANK-error guarantees (KLL,
t-digest) can be arbitrarily wrong about the VALUE at extreme
quantiles; DDSketch guarantees relative VALUE error: bucket i holds
values in (gamma^(i-1), gamma^i] with gamma = (1+alpha)/(1-alpha), so
any reported quantile is within alpha of the true value. The sketch is
one hash-aggregate of integer bucket counts — mergeable across
partitions/days/clusters by addition, which is what makes it THE
production latency-percentile structure.

Determinism discipline: a raw per-row ``ceil(ln(x)/ln(gamma))`` would
let two libm implementations disagree on boundary values (1-ulp drift,
150k-row exposure). Here the libm log only GUESSES the bucket (off by
at most one); the final assignment is settled by three comparisons
against the gamma^i boundary ladder, precomputed ONCE in Python and
embedded as the SAME double literals in both plans — O(1) per row AND
bit-identical across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df

_DD_ALPHA = 0.01
_DD_GAMMA = (1 + _DD_ALPHA) / (1 - _DD_ALPHA)
#: boundary ladder gamma^0 .. gamma^i covering (1, 1e7] — 807 rungs; at
#: 100 TB the ladder is still O(log range / alpha), independent of rows
_DD_IMAX = int(math.ceil(math.log(1e7) / math.log(_DD_GAMMA)))
_DD_BNDS = [_DD_GAMMA**i for i in range(_DD_IMAX + 1)]
_DD_LOG_G = repr(math.log(_DD_GAMMA))
_DD_QS = (0.5, 0.9, 0.99)

_SQL_BNDS = "[" + ", ".join(repr(b) for b in _DD_BNDS) + "]"
_SQL_QLIST = ", ".join(f"CAST({q} AS DOUBLE)" for q in _DD_QS)


@register(
    "agg_ddsketch_quantiles",
    oracle=f"""
WITH vals AS (
  SELECT o_orderpriority AS prio, o_totalprice AS x FROM orders
), guessed AS (
  -- O(1) bucket: libm log gives a guess; the embedded literal ladder
  -- decides the final bucket with pure comparisons (engine-identical)
  SELECT prio, x,
         CAST(ceil(ln(x) / {_DD_LOG_G}) AS BIGINT) AS b0
  FROM vals
), bucketed AS (
  -- bucket i satisfies ladder[i] < x <= ladder[i+1] (1-indexed ladder,
  -- ladder[k] = gamma^(k-1)); the libm guess is off by at most one, so
  -- three literal comparisons settle it identically in both engines
  SELECT prio,
         CASE
           WHEN x > {_SQL_BNDS}[CAST(b0 AS INT)]
                AND x <= {_SQL_BNDS}[CAST(b0 + 1 AS INT)] THEN b0
           WHEN x <= {_SQL_BNDS}[CAST(b0 AS INT)] THEN b0 - 1
           ELSE b0 + 1
         END AS b
  FROM guessed
), sk AS (
  SELECT prio, b, COUNT(*) AS c FROM bucketed GROUP BY prio, b
), cum AS (
  SELECT prio, b, c,
         SUM(c) OVER (PARTITION BY prio ORDER BY b) AS cum_c,
         SUM(c) OVER (PARTITION BY prio) AS n
  FROM sk
), hits AS (
  SELECT prio, q, MIN(b) AS qb
  FROM cum CROSS JOIN (SELECT unnest([{_SQL_QLIST}]) AS q)
  WHERE cum_c >= ceil(q * n)
  GROUP BY prio, q
), exact AS (
  SELECT prio, q, MIN(x) AS true_q
  FROM (
    SELECT prio, x,
           ROW_NUMBER() OVER (PARTITION BY prio ORDER BY x) AS rn,
           COUNT(*) OVER (PARTITION BY prio) AS n
    FROM vals
  ) CROSS JOIN (SELECT unnest([{_SQL_QLIST}]) AS q)
  WHERE rn = CAST(ceil(q * n) AS BIGINT)
  GROUP BY prio, q
)
SELECT h.prio, h.q,
       round(2 * {_SQL_BNDS}[CAST(h.qb + 1 AS INT)] / ({_DD_GAMMA!r} + 1), 4)
         AS dd_estimate,
       round(e.true_q, 4) AS exact_value,
       (abs(2 * {_SQL_BNDS}[CAST(h.qb + 1 AS INT)] / ({_DD_GAMMA!r} + 1)
            - e.true_q) <= {_DD_ALPHA} * e.true_q + 0.01) AS within_alpha
FROM hits h JOIN exact e ON e.prio = h.prio AND e.q = h.q
""",
    description="DDSketch (Masson et al., VLDB 2019) — the relative-"
    "error quantile sketch production latency monitoring runs on: "
    "bucket i covers (gamma^(i-1), gamma^i] with gamma=(1+a)/(1-a), "
    "a=1%, so reported p50/p90/p99 of order value per priority are "
    "guaranteed within 1% of the true VALUE (rank sketches can't bound "
    "value error at the tail). The sketch is one hash-aggregate of "
    "integer bucket counts over an O(log range / alpha) = 807-rung "
    "boundary ladder — mergeable across partitions/days by addition. "
    "Exact quantiles ride along and the within_alpha flag CERTIFIES "
    "the guarantee on every row. Bucket assignment is O(1) and libm-"
    "proof: the per-row log only guesses the bucket; three comparisons "
    "against the precomputed gamma^i ladder (identical double literals "
    "in both engines) settle it bit-identically.",
    tags=("agg", "sketch", "approx"),
)
def agg_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("x"),
    )
    bnds = F.array(*[F.lit(b) for b in _DD_BNDS])
    b0 = F.ceil(F.log(F.col("x")) / F.lit(float(_DD_LOG_G))).cast("long")
    # Clamp the libm guess into the ladder before element_at: x <= 1.0
    # makes b0 non-positive (element_at raises) and x above the ladder
    # top falls off the array (NULL) — out-of-ladder values degrade to
    # the edge buckets instead of erroring. In-ladder values are
    # untouched (clamp is a no-op), so sketch semantics are identical.
    bg = F.greatest(F.lit(1), F.least(b0, F.lit(len(_DD_BNDS) - 1)))
    at_b0 = F.element_at(bnds, bg.cast("int"))
    at_b0p = F.element_at(bnds, (bg + 1).cast("int"))
    x = F.col("x")
    b = (
        F.when((x > at_b0) & (x <= at_b0p), bg)
        .when(x <= at_b0, bg - 1)
        .otherwise(bg + 1)
    )
    sk = vals.select("prio", b.alias("b")).groupBy("prio", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = Window.partitionBy("prio").orderBy("b")
    wn = Window.partitionBy("prio")
    cum = sk.select(
        "prio",
        "b",
        F.sum("c").over(wc).alias("cum_c"),
        F.sum("c").over(wn).alias("n"),
    )
    qs = local_df(spark, [(q,) for q in _DD_QS], "q double")
    # bcast-ok: 3-row quantile probe frame
    hits = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum_c") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("prio", "q")
        .agg(F.min("b").alias("qb"))
    )
    wr = Window.partitionBy("prio").orderBy("x")
    ranked = vals.select(
        "prio",
        "x",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("prio")).alias("n"),
    )
    exact = (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.col("rn") == F.ceil(F.col("q") * F.col("n")).cast("bigint"))
        .groupBy("prio", "q")
        .agg(F.min("x").alias("true_q"))
    )
    gamma = float(_DD_GAMMA)
    est = (
        2
        * F.element_at(bnds, (F.col("qb") + 1).cast("int"))
        / F.lit(gamma + 1)
    )
    return hits.join(exact, ["prio", "q"]).select(
        "prio",
        "q",
        F.round(est, 4).alias("dd_estimate"),
        F.round("true_q", 4).alias("exact_value"),
        (
            F.abs(est - F.col("true_q"))
            <= _DD_ALPHA * F.col("true_q") + 0.01
        ).alias("within_alpha"),
    )
