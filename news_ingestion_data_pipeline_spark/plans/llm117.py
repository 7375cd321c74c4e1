"""Hundred-seventeenth wave: audio decimation resampling and ANY/ALL
quantified subqueries.

  * multimodal_audio_resample — integer-factor downsampling through the
    REAL WAV codec path (decode → boxcar decimate 4x → re-encode),
    certified sample-by-sample by integer checksums the oracle replays
    from the closed-form PCM formula.  The speech-pipeline stage that
    runs before feature extraction everywhere audio SR exceeds the
    model's input rate.
  * subquery_any_all — the quantified-comparison SQL surface (> ALL,
    < ANY) expressed as Spark aggregations-then-joins; pins the
    NULL-free semantics both engines agree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_FACTOR = 4
_N_MEDIA = 200


def _resample_oracle() -> str:
    # out(j) = floor(sum_{k=0..3} u(4j+k) / 4) - 32768 with
    # u(i) = (31*doc + 7*i) mod 65536  (unsigned domain -> sign-free floor)
    terms = " + ".join(
        f"((31 * doc_id + 7 * ({_FACTOR} * j + {k})) % 65536)"
        for k in range(_FACTOR)
    )
    return f"""WITH d AS (
  SELECT doc_id,
         8000 * ((doc_id % 8) * 250 + 500) // 1000 AS n_in
  FROM documents ORDER BY doc_id LIMIT {_N_MEDIA}
), js AS (
  SELECT doc_id, n_in, unnest(range(0, n_in // {_FACTOR})) AS j FROM d
), outs AS (
  SELECT doc_id, n_in, j,
         ({terms}) // {_FACTOR} - 32768 AS s
  FROM js
)
SELECT doc_id AS media_id,
       CAST(MAX(n_in) AS BIGINT) AS n_in,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(2000 AS INT) AS rate_out,
       CAST(SUM(s * s) AS BIGINT) AS sumsq_out,
       CAST(SUM((j + 1) * s) AS BIGINT) AS checksum_out
FROM outs
GROUP BY doc_id
ORDER BY media_id
"""


@register(
    "multimodal_audio_resample",
    oracle=_resample_oracle(),
    description=f"Audio decimation through the REAL WAV codec: decode "
    f"PCM-s16le, boxcar-average every {_FACTOR} samples (computed in the "
    "unsigned 0..65535 domain so the floor division is sign-free and "
    "engine-portable), re-encode at 2 kHz — the downsample stage every "
    "speech pipeline runs when source SR exceeds the model input rate. "
    "Certified exactly: Σs² and the position-weighted Σ(j+1)·s over ALL "
    "output samples are replayed by the oracle from the closed-form PCM "
    "formula, so a single wrong sample anywhere fails the hash. The "
    "re-encoded payload round-trips the codec executor-side (asserted in "
    "unit tests); only integer certificates cross the shuffle — at 100 TB "
    "the decode/DSP/encode never leaves the mapInPandas stage.",
    tags=("multimodal",),
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").orderBy("doc_id").limit(_N_MEDIA)
    media = mm.synthesize_media_real(docs, kind="audio").repartition(
        8, "media_id"
    )
    out = mm.resample_audio(media, factor=_FACTOR)
    return out.select(
        "media_id", "n_in", "n_out", "rate_out", "sumsq_out", "checksum_out"
    )


@register(
    "subquery_any_all",
    oracle="""
WITH urgent AS (
  SELECT o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
),
bounds AS (
  SELECT MAX(o_totalprice) AS mx, MIN(o_totalprice) AS mn FROM urgent
)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o.o_totalprice > (SELECT mx FROM bounds)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_all_urgent,
       CAST(SUM(CASE WHEN o.o_totalprice > (SELECT mn FROM bounds)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_any_urgent
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c_mktsegment
""",
    description="Quantified subquery comparisons — the `> ALL (...)` / "
    "`> ANY (...)` SQL surface: orders counted per market segment against "
    "the urgent-order price envelope (ALL reduces to > MAX, ANY to > MIN "
    "on a NULL-free, non-empty subquery — the semantics both engines "
    "agree on; empty/NULL-bearing subqueries diverge into three-valued "
    "logic, which the DQ expectations query family handles instead). "
    "Spark expresses the quantifier as a 1-row aggregate broadcast into "
    "the probe — the plan a 100 TB comparison wants: the subquery "
    "collapses to two scalars before touching the fact table.",
    tags=("subquery", "join", "agg"),
)
def subquery_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    bounds = orders.filter(F.col("o_orderpriority") == "1-URGENT").agg(
        F.max("o_totalprice").alias("mx"), F.min("o_totalprice").alias("mn")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .crossJoin(F.broadcast(bounds))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("o_totalprice") > F.col("mx"), 1).otherwise(0)
            ).alias("n_gt_all_urgent"),
            F.sum(
                F.when(F.col("o_totalprice") > F.col("mn"), 1).otherwise(0)
            ).alias("n_gt_any_urgent"),
        )
        
    )
