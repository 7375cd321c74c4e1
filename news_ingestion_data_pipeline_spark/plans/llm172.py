"""Hundred-seventy-second wave: data-mixture reweighting (DoReMi-lite).

DoReMi (Xie et al. 2023, arXiv:2305.10429) learns training-mixture
domain weights by exponentiated-gradient ascent on per-domain excess
loss. The lite version here folds a FIXED per-domain loss proxy through
T multiplicative-weights steps with uniform smoothing — the optimizer
dynamics without the proxy-model training loop. To stay bit-identical
across engines (MV_STRICT), the exp is replaced by its first-order
rational surrogate and the whole fold runs in INTEGER fixed-point
(parts-per-million weights, floor division) — the same
integer/decimal discipline as curation_language_rebalance
(plans/llm116.py):

    m_d      = M_BASE + loss_d              # ≈ exp(η·loss_d) · M_BASE
    u_d      = w_d · m_d                    # multiplicative update
    w'_d     = (u_d · S) // Σu              # normalize to S ppm
    w''_d    = (9·w'_d)//10 + S//(10·k)     # 10% uniform smoothing

Scale shape: the ONLY corpus-scale work is one groupBy(source) over the
documents table (count + sum of n_chars); the EG fold runs on the
k-row domain frame (k = distinct sources, bounded, not
SF-proportional) via agg + broadcast crossJoin per step — at 100 TB
this is a metadata-sized iteration after a single aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_S = 1_000_000  # ppm fixed-point scale
_MBASE = 1000  # multiplier base: m = MBASE + loss ≈ MBASE·exp(loss/MBASE)
_T = 4  # EG steps
_SMOOTH_NUM, _SMOOTH_DEN = 9, 10  # (1-c) = 9/10 uniform smoothing


def _oracle() -> str:
    steps = []
    prev = "s0"
    for i in range(1, _T + 1):
        steps.append(f"""
u{i} AS (SELECT source, n, loss, w * ({_MBASE} + loss) AS u FROM {prev}),
s{i} AS (
  SELECT source, n, loss,
         ({_SMOOTH_NUM} * ((u * {_S}) // (SELECT SUM(u) FROM u{i})))
           // {_SMOOTH_DEN}
         + ({_S} // ({_SMOOTH_DEN} * (SELECT k FROM kk))) AS w
  FROM u{i}
)""")
        prev = f"s{i}"
    return f"""
WITH dom AS (
  SELECT source, COUNT(*) AS n,
         CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS loss
  FROM documents GROUP BY source
),
kk AS (SELECT COUNT(*) AS k, SUM(n) AS total FROM dom),
s0 AS (
  SELECT source, n, loss, CAST({_S} // kk.k AS BIGINT) AS w
  FROM dom CROSS JOIN kk
),{",".join(steps)}
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(loss AS BIGINT) AS loss_proxy,
       CAST(w AS BIGINT) AS weight_ppm,
       CAST((n * {_S}) // (SELECT total FROM kk) AS BIGINT) AS natural_ppm,
       CAST(w - (n * {_S}) // (SELECT total FROM kk) AS BIGINT) AS boost_ppm
FROM {prev}
"""


@register(
    "curation_mixture_doremi",
    oracle=_oracle(),
    description="DoReMi-lite data-mixture reweighting: per-domain "
    "(source) loss proxy = integer mean n_chars; 4 exponentiated-"
    "gradient steps in ppm fixed-point (multiplier MBASE+loss — the "
    "rational exp surrogate — normalize by floor division, 10% uniform "
    "smoothing), exactly replayed by the oracle's chained CTEs. Output "
    "per domain: final mixture weight (ppm), the natural share, and the "
    "boost the optimizer assigned — higher-loss domains get upweighted, "
    "the DoReMi direction. Scale shape: ONE corpus aggregation "
    "(groupBy source), then a bounded k-row fold via broadcast "
    "crossJoins — metadata-scale iteration at 100 TB.",
    tags=("llm", "curation", "sampling"),
)
def curation_mixture_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    dom = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(n_chars) div count(1)").cast("long").alias("loss"),
    )
    kk = dom.agg(
        F.count(F.lit(1)).alias("k"), F.sum("n").alias("total")
    )
    cur = dom.crossJoin(F.broadcast(kk)).withColumn(
        "w", F.expr(f"{_S} div k").cast("long")
    )
    for _ in range(_T):
        cur = cur.withColumn("u", F.col("w") * (F.lit(_MBASE) + F.col("loss")))
        su = cur.agg(F.sum("u").alias("sum_u"))
        cur = (
            cur.crossJoin(F.broadcast(su))
            .withColumn(
                "w",
                F.expr(
                    f"({_SMOOTH_NUM} * ((u * {_S}) div sum_u))"
                    f" div {_SMOOTH_DEN}"
                    f" + ({_S} div ({_SMOOTH_DEN} * k))"
                ).cast("long"),
            )
            .drop("u", "sum_u")
        )
    return cur.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("loss").alias("loss_proxy"),
        F.col("w").alias("weight_ppm"),
        F.expr(f"(n * {_S}) div total").cast("long").alias("natural_ppm"),
        F.expr(f"w - (n * {_S}) div total").cast("long").alias("boost_ppm"),
    )
