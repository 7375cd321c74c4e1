"""Structured Streaming layer.

The reference is a manually-triggered incremental batch loop whose streaming
concepts (watermark/offset, late data, idempotent keyed sink) are hand-rolled
(SURVEY.md §2.9). This package is the principled Spark version:

    pipeline — readStream over landed raw-listing files → normalize →
               dropDuplicatesWithinWatermark → foreachBatch MERGE upsert,
               Trigger.AvailableNow (run-to-completion incremental batches)
    windows  — tumbling / sliding / session windowed aggregates with
               event-time watermarks over the events stream
    state    — custom stateful operator (running per-source counters) via
               applyInPandasWithState
"""

from news_ingestion_data_pipeline_spark.streaming.pipeline import (  # noqa: F401
    stream_ingest_available_now,
)
from news_ingestion_data_pipeline_spark.streaming.windows import (  # noqa: F401
    session_windows,
    sliding_counts,
    tumbling_counts,
)
