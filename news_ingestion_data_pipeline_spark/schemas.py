"""Canonical schemas (reference parity).

ARTICLE_SCHEMA mirrors the reference's single ``articles`` table
(reference: database_utils/database_methods.py:144-153, README.md:32-40) with
proper Spark types instead of all-TEXT: timestamps are real ``TimestampType``
(ordering semantics identical to the reference's zero-padded ISO-8601 TEXT —
see SURVEY.md §1.4), presentation formats are applied only at output time.

RAW_LISTING_SCHEMA is the pre-normalization record the paginated sources
emit — the dict shape built per-article by the reference scrapers
(reference: PhocusWire/PhocusWireSource.py:191-198, Skift/SkiftSource.py:176-183)
plus provenance fields (page_no) the reference keeps implicit.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Default full-load watermark (reference: database_utils/database_methods.py:21).
DEFAULT_WATERMARK = "2025-07-25T00:00:00"

#: Output presentation formats (SURVEY.md §1.4 / §7 "what's hard" #4):
#: News_published_time renders with a 'T' separator, Processed_at with a space.
PUBLISHED_TIME_FMT = "yyyy-MM-dd'T'HH:mm:ss"
PROCESSED_AT_FMT = "yyyy-MM-dd HH:mm:ss"

ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("Article_id", T.StringType(), False),  # md5(News_link), 32 hex
        T.StructField("News_link", T.StringType(), False),
        T.StructField("News_title", T.StringType(), False),
        T.StructField("Author_name", T.StringType(), True),
        T.StructField("News_published_time", T.TimestampType(), True),
        T.StructField("Source_name", T.StringType(), False),
        T.StructField("Processed_at", T.TimestampType(), False),
    ]
)

RAW_LISTING_SCHEMA = T.StructType(
    [
        T.StructField("raw_title", T.StringType(), True),
        T.StructField("raw_href", T.StringType(), True),
        T.StructField("raw_author", T.StringType(), True),
        T.StructField("raw_date", T.StringType(), True),
        T.StructField("source_name", T.StringType(), False),
        T.StructField("page_no", T.IntegerType(), True),
    ]
)

#: Per-source config: how raw fields become canonical ones.
SOURCE_CONFIGS = {
    # reference: Skift/SkiftSource.py — ISO timestamps with tz offset; absolute hrefs.
    "Skift": {
        "base_url": "",
        "date_kind": "iso",
    },
    # reference: PhocusWire/PhocusWireSource.py — 'July 28, 2025' dates; relative hrefs.
    "Phocuswire": {
        "base_url": "https://www.phocuswire.com",
        "date_kind": "long_us",
    },
}
