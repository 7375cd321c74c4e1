"""Forty-third wave: deterministic per-epoch corpus shuffling — the
data-ordering primitive of a training run, seedless and restartable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_EPOCHS = 3
_HEAD = 10


@register(
    "curation_epoch_shuffle",
    oracle=f"""
WITH epochs AS (
  SELECT unnest(range(1, {_EPOCHS} + 1)) AS epoch
), keyed AS (
  SELECT e.epoch, d.doc_id,
         md5('epoch' || CAST(e.epoch AS VARCHAR) || ':'
             || CAST(d.doc_id AS VARCHAR)) AS k
  FROM documents d CROSS JOIN epochs e
), ranked AS (
  SELECT epoch, doc_id,
         ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS pos
  FROM keyed
)
SELECT CAST(epoch AS INT) AS epoch,
       CAST(pos AS INT) AS pos,
       doc_id
FROM ranked WHERE pos <= {_HEAD}
ORDER BY epoch, pos
""",
    description="Per-epoch corpus shuffle: each training epoch orders "
    "the corpus by md5('epoch<N>:' || doc_id) — a different, "
    "deterministic, SEEDLESS permutation per epoch, so (a) a preempted "
    "run resumes mid-epoch at an exact position with no RNG state to "
    "restore, (b) any worker can compute any shard of the order "
    "independently, and (c) epochs decorrelate (the md5 keys are "
    "independent across the epoch prefix) — exactly the property a "
    "distributed dataloader needs that a seeded Fisher-Yates can't "
    "give without materializing the permutation. The query emits each "
    f"epoch's first {_HEAD} positions as the verifiable fingerprint of "
    "the full order. At 100 TB the ORDER BY is a range partition on "
    "the hash key (write-time sort), and 'position' is the file/offset "
    "coordinate — the same two-pass rank as every global order here.",
    tags=("curation", "llm", "sampling"),
)
def curation_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(1, _EPOCHS + 1).select(
        F.col("id").cast("int").alias("epoch")
    )
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.lit("epoch"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("k"),
    )
    w = Window.partitionBy("epoch").orderBy("k", "doc_id")
    return (
        keyed.select(
            "epoch", "doc_id", F.row_number().over(w).alias("pos")
        )
        .where(F.col("pos") <= _HEAD)
        .select("epoch", F.col("pos").cast("int").alias("pos"), "doc_id")
        
    )
