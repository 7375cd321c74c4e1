"""Top-N latest articles — the reference's one consumer-facing query.

Reference: ``Database.query_topn_articles``
(database_utils/database_methods.py:109-130): ORDER BY News_published_time
DESC LIMIT n, full 7-column projection.

Spark plans orderBy+limit as ``TakeOrderedAndProject``: per-partition top-K
then a driver-side merge — no global sort, no full shuffle, O(K) memory.
This is the plan that survives 100 TB (K rows per partition cross the wire,
not the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions.scalars import (
    fmt_processed_at,
    fmt_published_time,
)


def top_n_articles(articles: DataFrame, n: int = 5) -> DataFrame:
    """Latest n articles, newest first; NULL timestamps last (matches the
    reference's SQLite DESC-on-TEXT ordering). Article_id is the
    deterministic tiebreaker for equal timestamps."""
    return articles.orderBy(
        F.col("News_published_time").desc_nulls_last(), F.col("Article_id")
    ).limit(n)


def top_n_articles_presented(articles: DataFrame, n: int = 5) -> DataFrame:
    """Same rows with the reference's presentation formats applied
    (published time with 'T' separator, processed time with space)."""
    return top_n_articles(articles, n).select(
        "Article_id",
        "News_link",
        "News_title",
        "Author_name",
        fmt_published_time(F.col("News_published_time")).alias("News_published_time"),
        "Source_name",
        fmt_processed_at(F.col("Processed_at")).alias("Processed_at"),
    )
