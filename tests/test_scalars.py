"""Scalar-function parity tests (SURVEY.md §2.4, X1-X5).

Each asserts bit-identical output to the reference helpers
(reference: helper_utils/helpers.py) on the exact input shapes the two
scrapers produce, including the malformed variants the reference guards.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import scalars


def one(df, colname="v"):
    return df.select(F.col(colname)).first()[0]


def test_article_id_matches_md5(spark):
    url = "https://www.phocuswire.com/some/article?x=1&y=%20z"
    df = spark.createDataFrame([Row(u=url)])
    got = one(df.select(scalars.article_id(F.col("u")).alias("v")))
    assert got == hashlib.md5(url.encode("utf-8")).hexdigest()


def test_parse_long_us_date(spark):
    df = spark.createDataFrame(
        [Row(d="July 28, 2025"), Row(d=" March 3, 2024 "), Row(d="not a date"), Row(d=None)]
    )
    out = [
        r[0]
        for r in df.select(
            scalars.parse_news_date(F.col("d"), "long_us").alias("v")
        ).collect()
    ]
    assert str(out[0]) == "2025-07-28 00:00:00"
    assert str(out[1]) == "2024-03-03 00:00:00"
    assert out[2] is None  # None-on-failure, row admitted (SURVEY.md §1.4.4)
    assert out[3] is None


def test_parse_iso_drops_timezone_keeps_wall_clock(spark):
    # Skift emits tz-offset ISO; the reference keeps wall-clock and drops the
    # offset (helper_utils/helpers.py:26-38).
    df = spark.createDataFrame(
        [
            Row(d="2025-07-31T17:48:19+00:00"),
            Row(d="2025-07-31T17:48:19-04:00"),
            Row(d="2025-07-31T17:48:19"),
        ]
    )
    out = [
        str(r[0])
        for r in df.select(
            scalars.parse_news_date(F.col("d"), "iso").alias("v")
        ).collect()
    ]
    assert out == ["2025-07-31 17:48:19"] * 3


def test_fmt_published_vs_processed_formats(spark):
    df = spark.createDataFrame([Row(t="2025-08-01 07:30:05")]).select(
        F.col("t").cast("timestamp").alias("t")
    )
    assert one(df.select(scalars.fmt_published_time(F.col("t")).alias("v"))) == (
        "2025-08-01T07:30:05"
    )
    assert one(df.select(scalars.fmt_processed_at(F.col("t")).alias("v"))) == (
        "2025-08-01 07:30:05"
    )


def test_fmt_published_time_null_safe(spark):
    df = spark.createDataFrame([Row(t=None)], "t timestamp")
    assert one(df.select(scalars.fmt_published_time(F.col("t")).alias("v"))) is None


def test_strip_author_prefix(spark):
    df = spark.createDataFrame(
        [Row(a="By Abby Crotty"), Row(a="Mitra Sorrells"), Row(a=None)]
    )
    out = [
        r[0]
        for r in df.select(scalars.strip_author_prefix(F.col("a")).alias("v")).collect()
    ]
    assert out == ["Abby Crotty", "Mitra Sorrells", None]


def test_absolutize_href(spark):
    df = spark.createDataFrame(
        [Row(h="/Latest-News/article-1"), Row(h="https://x.com/a")]
    )
    out = [
        r[0]
        for r in df.select(
            scalars.absolutize_href(F.col("h"), "https://www.phocuswire.com").alias("v")
        ).collect()
    ]
    assert out == ["https://www.phocuswire.com/Latest-News/article-1", "https://x.com/a"]


def test_day_trunc(spark):
    df = spark.createDataFrame([Row(t="2025-08-01 17:45:12")]).select(
        F.col("t").cast("timestamp").alias("t")
    )
    assert str(one(df.select(scalars.day_trunc(F.col("t")).alias("v")))) == (
        "2025-08-01 00:00:00"
    )
