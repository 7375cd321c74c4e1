"""Custom stateful streaming operator: per-source running article counters.

Demonstrates the ``applyInPandasWithState`` escape hatch (SURVEY.md §2.12 —
the operator class Spark's built-ins don't cover): arbitrary per-group state
evolved across micro-batches, Arrow-batched (no row-at-a-time Python).

The operator keeps, per Source_name, a running total and the max event time
seen, emitting one updated row per group per micro-batch — the streaming
analog of the reference's end-of-run count log
(reference: Skift/SkiftSource.py:195, ingestion.ipynb cell 3).

State size is O(#groups) — scale-safe regardless of row volume.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "Source_name string, total bigint, max_ts timestamp"
STATE_SCHEMA = "total bigint, max_ts timestamp"


def _update_counts(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    total, max_ts = state.get if state.exists else (0, None)
    for pdf in pdfs:
        total += len(pdf)
        batch_max = pdf["News_published_time"].max()
        if pd.notna(batch_max):
            max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
    state.update((total, max_ts))
    yield pd.DataFrame(
        {"Source_name": [key[0]], "total": [total], "max_ts": [max_ts]}
    )


def running_source_counts(articles: DataFrame) -> DataFrame:
    """Streaming DataFrame of canonical articles → one running-counter row
    per source per micro-batch (output mode: update)."""
    return (
        articles.select("Source_name", "News_published_time")
        .groupBy("Source_name")
        .applyInPandasWithState(
            _update_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
