"""Hundred-thirty-fourth wave: tail-risk GPD fit, trimmed means, and
image sharpness filtering.

  * agg_tail_pot_gpd — extreme-value analytics: peaks-over-threshold
    with a method-of-moments Generalized Pareto fit to the excesses
    (xi = (1 - m^2/v)/2, beta = m*(m^2/v + 1)/2).  The tail-index
    machinery behind VaR-style "how bad can a day get" questions,
    closed-form from exact decimal power sums.
  * agg_trimmed_mean — the robust mean everyone actually ships: drop
    the top and bottom 5% BY RANK per group (exact, not approximate
    quantiles), average the middle.  Rank cutoffs are integer
    arithmetic so the trimmed set is identical cross-engine.
  * multimodal_image_sharpness — blur/quality filtering for image
    corpora: integer 4-neighbor Laplacian energy per image through the
    REAL BMP decode, oracle-replayed from the closed-form pixel
    formula (the synthetic gradient is Laplacian-zero except at
    mod-256 wrap seams, so the energy counts seam pixels — certifying
    the convolution plumbing end to end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_U = 400000.0  # POT threshold on order value


@register(
    "agg_tail_pot_gpd",
    oracle=f"""
WITH exc AS (
  SELECT CAST(o_totalprice - {_U} AS DECIMAL(12,2)) AS x
  FROM orders WHERE o_totalprice > {_U}
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx
  FROM exc
),
m AS (
  SELECT n, sx / n AS mean_exc,
         (sxx - sx * sx / n) / (n - 1) AS var_exc
  FROM s
)
SELECT CAST(n AS BIGINT) AS n_exceedances,
       mean_exc,
       (1.0 - mean_exc * mean_exc / var_exc) / 2.0 AS gpd_xi,
       mean_exc * (mean_exc * mean_exc / var_exc + 1.0) / 2.0 AS gpd_beta
FROM m
""",
    description=f"Peaks-over-threshold tail fit: order values above "
    f"{_U:.0f} reduced to excesses, Generalized Pareto parameters by "
    "method of moments (xi = (1 - m²/v)/2, beta = m(m²/v + 1)/2) — the "
    "extreme-value toolkit behind 'how heavy is the tail' risk "
    "questions, where empirical quantiles run out of data precisely "
    "where it matters. Mean and variance come from exact decimal power "
    "sums, the parameter arithmetic is one deterministic IEEE chain — "
    "bit-identical cross-engine. Scale: one filtered map-side-combined "
    "aggregate; three numbers cross the shuffle.",
    tags=("agg", "stats"),
)
def agg_tail_pot_gpd(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = (F.col("o_totalprice") - _U).cast("decimal(12,2)")
    s = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > _U)
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(x * x).cast("double").alias("sxx"),
        )
    )
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    m = s.select(
        F.col("n").cast("bigint").alias("n_exceedances"),
        mean.alias("mean_exc"),
        var.alias("var_exc"),
    )
    r = F.col("mean_exc") * F.col("mean_exc") / F.col("var_exc")
    return m.select(
        "n_exceedances",
        "mean_exc",
        ((1.0 - r) / 2.0).alias("gpd_xi"),
        (F.col("mean_exc") * (r + 1.0) / 2.0).alias("gpd_beta"),
    )


_TRIM_PCT = 5  # percent trimmed from EACH end


@register(
    "agg_trimmed_mean",
    oracle=f"""
WITH ranked AS (
  SELECT o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
kept AS (
  SELECT prio, v, n, (n * {_TRIM_PCT}) // 100 AS cut
  FROM ranked
  WHERE rn > (n * {_TRIM_PCT}) // 100
    AND rn <= n - (n * {_TRIM_PCT}) // 100
)
SELECT prio,
       CAST(MAX(n) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*) AS trimmed_mean
FROM kept
GROUP BY prio
ORDER BY prio
""",
    description=f"Exact {_TRIM_PCT}%-each-end trimmed mean per order "
    "priority: values ranked with a total (value, orderkey) order, the "
    "integer cut count (n*pct div 100) dropped from both ends BY RANK — "
    "not by approximate quantile, so the kept set (and therefore the "
    "mean) is bit-identical cross-engine; the sum is exact decimal. The "
    "robust location estimate that survives fat-finger orders where the "
    "plain mean (agg_stats_suite) doesn't. One (priority) shuffle shared "
    "by the two windows and the final aggregate.",
    tags=("agg", "stats", "window"),
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    cut = F.expr(f"(n * {_TRIM_PCT}) div 100")
    kept = ranked.filter(
        (F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut)
    )
    return (
        kept.groupBy("prio")
        .agg(
            F.max("n").cast("bigint").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            (
                F.sum("v").cast("double") / F.count(F.lit(1))
            ).alias("trimmed_mean"),
        )
        
    )


_N_IMG = 100


@register(
    "multimodal_image_sharpness",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         64 + (doc_id % 3) * 8 AS h,
         64 + (doc_id % 4) * 8 AS w
  FROM documents WHERE doc_id < {_N_IMG}
), px AS (
  SELECT doc_id, h, w, unnest(range(0, h * w * 3)) AS p FROM d
), v AS (
  SELECT doc_id, h, w,
         (p // 3) // w AS y, ((p // 3) % w) AS x, p % 3 AS c,
         (3 * doc_id + (p % 3) + (p // 3)) % 256 AS pv
  FROM px
), lap AS (
  SELECT doc_id, h, w, y, x, c,
         abs(4 * pv
             - ((3 * doc_id + c + ((y - 1) * w + x)) % 256)
             - ((3 * doc_id + c + ((y + 1) * w + x)) % 256)
             - ((3 * doc_id + c + (y * w + x - 1)) % 256)
             - ((3 * doc_id + c + (y * w + x + 1)) % 256)) AS a
  FROM v
  WHERE y > 0 AND y < h - 1 AND x > 0 AND x < w - 1
)
SELECT doc_id AS media_id,
       CAST(SUM(a) AS BIGINT) AS laplacian_energy,
       CAST(SUM(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_edge_px,
       CAST(SUM(a) >= 1000 AS BOOLEAN) AS keep_sharp
FROM lap
GROUP BY doc_id
ORDER BY media_id
""",
    description="Image sharpness (blur) filtering through the REAL BMP "
    "decode: integer 4-neighbor Laplacian |4p - up - down - left - "
    "right| summed over interior pixels per channel — the standard "
    "variance-of-Laplacian blur gate a multimodal corpus runs before "
    "training. On the synthetic gradient the Laplacian is zero except "
    "at mod-256 wrap seams, so the oracle's closed-form replay certifies "
    "the convolution indexing exactly (one misaligned neighbor offset "
    "anywhere and the seam count changes). Decode + convolution stay in "
    "the Arrow batch; 3 integers per image cross the shuffle.",
    tags=("multimodal",),
)
def multimodal_image_sharpness(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from typing import Iterator

    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_IMG)
    media = mm.synthesize_media_real(docs).repartition(8, "media_id")
    decode = mm.DECODERS["real"]

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                img = decode(bytes(payload), meta).astype(np.int64)
                core = img[1:-1, 1:-1, :]
                lap = np.abs(
                    4 * core
                    - img[:-2, 1:-1, :]
                    - img[2:, 1:-1, :]
                    - img[1:-1, :-2, :]
                    - img[1:-1, 2:, :]
                )
                energy = int(lap.sum())
                rows.append(
                    {
                        "media_id": int(media_id),
                        "laplacian_energy": energy,
                        "n_edge_px": int((lap > 0).sum()),
                        "keep_sharp": bool(energy >= 1000),
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {
                    "media_id": pd.Series(dtype="int64"),
                    "laplacian_energy": pd.Series(dtype="int64"),
                    "n_edge_px": pd.Series(dtype="int64"),
                    "keep_sharp": pd.Series(dtype="bool"),
                }
            )

    out = media.mapInPandas(
        batches,
        schema=(
            "media_id bigint, laplacian_energy bigint, n_edge_px bigint, "
            "keep_sharp boolean"
        ),
    )
    return out
