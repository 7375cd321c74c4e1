"""Streaming ingestion: landed raw listings → canonical articles table.

Batch and streaming share ONE transform library: ``normalize_listing`` /
``apply_incremental_cutoff`` (operators/normalize.py) are plain
DataFrame→DataFrame functions, so the same Catalyst plan fragments run under
``readStream``. Only the dedup differs — streaming uses
``dropDuplicatesWithinWatermark`` (state-bounded, the principled form of the
reference's in-run ``seen_article_ids`` set + cross-run keyed upsert,
reference: PhocusWire/PhocusWireSource.py:155-158,
database_utils/database_methods.py:84-94) — and the sink is a foreachBatch
MERGE (per-micro-batch transactional upsert ≈ the reference's
one-transaction-per-run).

Scale: file source lists incrementally (maxFilesPerTrigger), state for the
within-watermark dedup is bounded by the event-time horizon, and the MERGE
per micro-batch touches only matched keys — the same pattern runs on a
1000-executor cluster against a continuous landing zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from news_ingestion_data_pipeline_spark.operators import normalize, upsert
from news_ingestion_data_pipeline_spark.schemas import RAW_LISTING_SCHEMA


def normalize_stream(raw_stream: DataFrame, dedup_delay: str = "2 days") -> DataFrame:
    """Raw listing stream → canonical article rows, key-deduped within the
    watermark horizon. NULL-timestamp rows are admitted (cutoff semantics
    §1.4.4) — they fall outside event-time state and rely on the keyed sink
    for cross-batch idempotence, same as the reference."""
    canon = normalize.finalize_articles(normalize.normalize_listing(raw_stream))
    return canon.withWatermark("News_published_time", dedup_delay).dropDuplicatesWithinWatermark(
        ["Article_id"]
    )


def stream_ingest_available_now(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    checkpoint_dir: str,
    dedup_delay: str = "2 days",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all files currently in ``landing_dir`` into the articles table
    (Trigger.AvailableNow — the streaming analog of the reference's
    manually-triggered incremental run), then stop.

    Exactly-once to the keyed sink: checkpoint tracks consumed files, MERGE
    makes replays idempotent.
    """
    raw = (
        spark.readStream.schema(RAW_LISTING_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
        .parquet(landing_dir)
    )
    articles = normalize_stream(raw, dedup_delay=dedup_delay)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert.upsert_articles(batch_df.sparkSession, table_path, batch_df)

    (
        articles.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
