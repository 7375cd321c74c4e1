"""Watermark scan — full-vs-incremental load decision.

Reference: ``Database.get_latest_news_time``
(database_utils/database_methods.py:40-66): read MAX(News_published_time)
from the sink, day-truncate it, fall back to the constant default when the
table is empty. The sink doubles as the offset store.

Spark shape: ungrouped MAX = partial max per partition + final max — a
metadata-sized job even at 100 TB (and O(1) if the sink keeps column stats,
e.g. parquet footer min/max, which Spark exploits for max() under AQE).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.schemas import DEFAULT_WATERMARK


def latest_news_time(
    articles: DataFrame | None,
    default: str = DEFAULT_WATERMARK,
) -> tuple[datetime, bool]:
    """Return (day-truncated watermark, is_incremental).

    is_incremental=False when the table is missing/empty → caller does a
    full load from the default watermark, mirroring the reference.
    """
    default_dt = datetime.fromisoformat(default)
    if articles is None:
        return default_dt, False
    row = articles.agg(
        F.date_trunc("day", F.max("News_published_time")).alias("wm")
    ).first()
    if row is None or row["wm"] is None:
        return default_dt, False
    return row["wm"], True
