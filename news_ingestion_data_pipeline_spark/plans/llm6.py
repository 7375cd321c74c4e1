"""Sixth wave: cascade rollups (aggregate-from-aggregate correctness),
int8 scalar-quantized similarity search (the ANN memory-compression
technique), and streaming checkpoint-resume (state survives a query
restart) — each with a DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm6")


def _sfx(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


@register(
    "agg_rollup_cascade",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         AS sum_value
FROM events
GROUP BY date_trunc('day', ts)
ORDER BY day
""",
    description="Cascade (hierarchical) rollup — the continuous-aggregate "
    "pattern of time-series stores: raw events aggregate to an HOUR-level "
    "rollup table, and the DAY level is derived ONLY from the hour level "
    "(sum-of-sums, count-of-counts), never from raw. Because the partial "
    "sums are exact DECIMAL, re-aggregation is associative and the "
    "2-level result hash-matches the oracle's direct day-from-raw "
    "aggregate — the invariant that lets a 100 TB deployment keep "
    "minute/hour/day rollups and answer each query from the coarsest "
    "sufficient level (1/3600th the rows) without drift. Double sums "
    "would NOT survive this cascade; decimal partials are the point.",
    tags=("agg", "rollup", "timeseries"),
)
def agg_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ts = F.col("ts").cast("timestamp")
    hour = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", ts).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,10)")).alias("s"),
        )
    )
    return (
        hour.groupBy(F.date_trunc("day", F.col("hour")).cast("date").alias("day"))
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("decimal(20,10)").cast("double").alias("sum_value"),
        )
        
    )


_QDIM = 64


def _quant_oracle() -> str:
    """Per-dimension min/max scalar quantization to 8-bit codes, decode,
    exact top-k on the DECODED vectors — mirrors sim_quantized_topk."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (
  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
  FROM e, generate_series(1, {_QDIM}) AS g(i)
  GROUP BY i
), stats AS (
  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM dims
), dq AS (
  SELECT vec_id,
         list_transform(v, (x, i) ->
           mns[i] + floor((x - mns[i]) * 255.0 / (mxs[i] - mns[i]))
                    * (mxs[i] - mns[i]) / 255.0) AS d
  FROM e, stats
), q AS (SELECT vec_id, d FROM dq WHERE vec_id < 10)
SELECT query_id, neighbor_id, qcos_sim, rank FROM (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         round(list_dot_product(a.d, q.d) / (sqrt(list_dot_product(a.d, a.d))
               * sqrt(list_dot_product(q.d, q.d))), 6) AS qcos_sim,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY round(list_dot_product(a.d, q.d)
                              / (sqrt(list_dot_product(a.d, a.d))
                                 * sqrt(list_dot_product(q.d, q.d))), 6) DESC,
                            a.vec_id) AS rank
  FROM dq a CROSS JOIN q
  WHERE a.vec_id != q.vec_id
) WHERE rank <= 5
"""


@register(
    "sim_quantized_topk",
    oracle=_quant_oracle(),
    description="Scalar-quantized (int8) similarity search — the memory-"
    "compression half of a production ANN index: each dimension is "
    "affinely mapped to an 8-bit code by its corpus-wide min/max (4x "
    "smaller vectors, 4x more index per node at 100 TB), and search "
    "ranks by cosine over the DECODED codes. Quantization uses floor "
    "(never round-half) so the codes are bit-deterministic cross-engine; "
    "the per-dim stats pass is one posexplode + 64-group aggregate "
    "(map-side partial), broadcast back as two 64-float literals-worth "
    "of state. The oracle re-derives codes and ranking relationally; a "
    "test compares quantized vs exact top-k overlap (recall) so the "
    "accuracy cost of compression is measured, not assumed.",
    tags=("llm", "similarity", "quantization"),
)
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = (
        e.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    stats = dims.agg(
        F.array_sort(F.collect_list(F.struct("i", "mn"))).alias("mn_s"),
        F.array_sort(F.collect_list(F.struct("i", "mx"))).alias("mx_s"),
    ).select(
        F.transform("mn_s", lambda s: s["mn"]).alias("mns"),
        F.transform("mx_s", lambda s: s["mx"]).alias("mxs"),
    )
    dq = e.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        F.transform(
            F.arrays_zip("v", "mns", "mxs"),
            lambda s: s["mns"]
            + F.floor((s["v"] - s["mns"]) * 255.0 / (s["mxs"] - s["mns"]))
            * (s["mxs"] - s["mns"])
            / 255.0,
        ).alias("d"),
    ).localCheckpoint()  # corpus + query sides both read it

    from news_ingestion_data_pipeline_spark.functions import vectors as V

    q = F.broadcast(
        dq.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("d").alias("qd"),
            V.norm(F.col("d")).alias("qn"),
        )
    )
    c = dq.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("d").alias("cd"),
        V.norm(F.col("d")).alias("cn"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.cosine_from_norms(
                    F.col("cd"), F.col("qd"), F.col("cn"), F.col("qn")
                ),
                6,
            ).alias("qcos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 5
    )


@register(
    "stream_checkpoint_resume",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    description="Checkpoint-resume across a QUERY RESTART — the "
    "fault-tolerance contract streaming pipelines actually rely on: the "
    "corpus is re-laid as four files; a first streaming query (with a "
    "real checkpointLocation) drains two of them and STOPS; a second, "
    "separately-constructed query on the same checkpoint picks up the "
    "aggregation state and source offsets, processes ONLY the two new "
    "files, and its complete-mode output equals the batch aggregate over "
    "everything — proving state recovery + no reprocessing (file-source "
    "offsets) + no loss. This is the operational difference between a "
    "streaming ENGINE and a loop that re-reads the world each run (the "
    "reference restarts from its watermark; Spark restarts from "
    "exactly-once state).",
    tags=("streaming", "checkpoint", "stateful"),
)
def stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = _sfx(sf_dir)
    stage = f"{_ROOT}/stage_{sfx}"
    src = f"{_ROOT}/src_{sfx}"
    ckpt = f"{_ROOT}/ckpt_{sfx}"
    for p in (stage, src, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    ev.repartition(4).write.mode("overwrite").parquet(stage)
    parts = sorted(
        f for f in os.listdir(stage) if f.endswith(".parquet")
    )
    os.makedirs(src, exist_ok=True)

    name = f"stream_ckpt_{sfx}"

    def run_once() -> None:
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        agg = (
            spark.readStream.schema("event_type string, value double")
            .parquet(src)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(20,10)"))
                .cast("double")
                .alias("sum_value"),
            )
        )
        from news_ingestion_data_pipeline_spark.session import (
            stream_state_partitions,
        )

        # both phases resume the SAME checkpoint: the pinned width is
        # recorded at phase 1 and must match at phase 2 (it does — the
        # context manager pins the same value for every start)
        with stream_state_partitions(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            q.stop()

    # phase 1: two files visible, drain, stop
    for p in parts[:2]:
        shutil.copy(os.path.join(stage, p), os.path.join(src, p))
    run_once()
    # phase 2: two more files appear; a NEW query resumes from the same
    # checkpoint — restored state + source offsets, only new files read
    for p in parts[2:]:
        shutil.copy(os.path.join(stage, p), os.path.join(src, p))
    run_once()
    return spark.table(name).select(
        "event_type",
        "n_events",
        # complete-mode sink: sum already cast; re-emit deterministic cols
        F.col("sum_value"),
    )
