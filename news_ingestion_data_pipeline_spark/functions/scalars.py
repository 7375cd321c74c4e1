"""Scalar column functions — reference parity (SURVEY.md §2.4).

Every function here is a composition of built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd). Zero Python UDFs: at 100 TB these run
inside the scan/project stages with no serialization boundary.

Reference citations:
    article_id          — helper_utils/helpers.py:40-50  (md5 of URL)
    parse_news_date     — helper_utils/helpers.py:4-24   (per-source format)
    drop_timezone       — helper_utils/helpers.py:26-38  (keep wall clock)
    fmt_published_time  — helper_utils/helpers.py:53-69  (ISO 'T' format)
    day_trunc           — database_utils/database_methods.py:62
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.schemas import (
    PROCESSED_AT_FMT,
    PUBLISHED_TIME_FMT,
)


def article_id(url: Column | str) -> Column:
    """32-char lowercase hex MD5 of the article URL — bit-identical to the
    reference's ``hashlib.md5(url.encode('utf-8')).hexdigest()``."""
    return F.md5(F.col(url) if isinstance(url, str) else url)


def parse_news_date(raw: Column, date_kind: str) -> Column:
    """Parse a source-specific date string; NULL on failure (the reference
    returns None and admits the row — SURVEY.md §1.4.4).

    date_kind:
        'long_us' — ``July 28, 2025``  (PhocusWire)
        'iso'     — ISO-8601, possibly with a tz offset (Skift); the offset is
                    *discarded keeping wall-clock time* (drop_timezone).
    """
    if date_kind == "long_us":
        return F.try_to_timestamp(F.trim(raw), F.lit("MMMM d, yyyy"))
    if date_kind == "iso":
        return F.try_to_timestamp(drop_timezone(raw))
    raise ValueError(f"unknown date_kind {date_kind!r}")


def drop_timezone(iso_string: Column) -> Column:
    """``2025-07-31T17:48:19+00:00`` → ``2025-07-31T17:48:19``.

    The reference parses then re-formats, which is exactly a truncation to the
    first 19 chars for zero-padded ISO-8601 — the faithful wall-clock-keeping
    form (SURVEY.md §7 "what's hard" #2), independent of session time zone.
    """
    return F.substring(F.trim(iso_string), 1, 19)


def fmt_published_time(ts: Column) -> Column:
    """Timestamp → ``YYYY-MM-DDTHH:MM:SS`` presentation string (null-safe;
    the reference's unguarded ``dt.strftime`` would crash on None)."""
    return F.when(ts.isNotNull(), F.date_format(ts, PUBLISHED_TIME_FMT))


def fmt_processed_at(ts: Column) -> Column:
    """Timestamp → ``YYYY-MM-DD HH:MM:SS`` (space separator — the SQLite
    CURRENT_TIMESTAMP presentation; differs from the published-time format)."""
    return F.date_format(ts, PROCESSED_AT_FMT)


def day_trunc(ts: Column) -> Column:
    """Zero out time-of-day (watermark truncation; PhocusWire publishes only
    dates, so the incremental cutoff compares at day granularity)."""
    return F.date_trunc("day", ts)


def strip_author_prefix(author: Column) -> Column:
    """``By Abby Crotty`` → ``Abby Crotty`` (PhocusWire byline prefix)."""
    return F.trim(F.regexp_replace(author, r"^By\s+", ""))


def absolutize_href(href: Column, base_url: str) -> Column:
    """Prefix relative hrefs with the source base URL; absolute ones pass."""
    if not base_url:
        return href
    return F.when(href.startswith("http"), href).otherwise(
        F.concat(F.lit(base_url), href)
    )
