"""normalize_pipeline semantics (SURVEY.md §2.2-§2.3, F1-F4 / P1-P5).

Covers the filter/normalize behaviors both reference scrapers implement
(reference: PhocusWire/PhocusWireSource.py:131-201, Skift/SkiftSource.py:126-185)
including the edge cases: missing title/href, unparseable date (row admitted
with NULL ts), strict-< watermark cutoff with boundary re-ingest, and
first-seen-wins in-batch dedup.
"""

from __future__ import annotations

from pyspark.sql import Row

from news_ingestion_data_pipeline_spark.operators import normalize
from news_ingestion_data_pipeline_spark.schemas import RAW_LISTING_SCHEMA


def raw_df(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows], RAW_LISTING_SCHEMA)


def base_row(**over):
    r = {
        "raw_title": " Title ",
        "raw_href": "/a1",
        "raw_author": "By Someone",
        "raw_date": "July 28, 2025",
        "source_name": "Phocuswire",
        "page_no": 1,
    }
    r.update(over)
    return r


def test_missing_title_and_href_dropped(spark):
    df = raw_df(
        spark,
        [
            base_row(),
            base_row(raw_title=None, raw_href="/a2"),
            base_row(raw_href=None),
        ],
    )
    out = normalize.normalize_listing(df)
    assert out.count() == 1


def test_projection_normalization(spark):
    out = normalize.normalize_listing(raw_df(spark, [base_row()])).first()
    assert out["News_title"] == "Title"  # trimmed
    assert out["News_link"] == "https://www.phocuswire.com/a1"  # absolutized
    assert out["Author_name"] == "Someone"  # 'By ' stripped
    assert str(out["News_published_time"]) == "2025-07-28 00:00:00"
    assert len(out["Article_id"]) == 32


def test_unparseable_date_admitted_with_null_ts(spark):
    out = normalize.normalize_listing(
        raw_df(spark, [base_row(raw_date="garbage")])
    ).first()
    assert out["News_published_time"] is None


def test_cutoff_strict_less_than(spark):
    # boundary-day rows (== watermark) are KEPT and re-ingested by design
    # (reference: README.md:60-64; Skift/SkiftSource.py:166-170).
    df = normalize.normalize_listing(
        raw_df(
            spark,
            [
                base_row(raw_href="/old", raw_date="July 27, 2025"),
                base_row(raw_href="/boundary", raw_date="July 28, 2025"),
                base_row(raw_href="/new", raw_date="July 29, 2025"),
                base_row(raw_href="/undated", raw_date="nope"),
            ],
        )
    )
    kept = normalize.apply_incremental_cutoff(df, "2025-07-28T00:00:00")
    links = {r["News_link"].rsplit("/", 1)[-1] for r in kept.collect()}
    assert links == {"boundary", "new", "undated"}  # NULL ts passes the cutoff


def test_first_seen_wins_dedup(spark):
    df = normalize.normalize_listing(
        raw_df(
            spark,
            [
                base_row(raw_href="/dup", raw_title="first", page_no=1),
                base_row(raw_href="/dup", raw_title="second", page_no=2),
                base_row(raw_href="/other", page_no=2),
            ],
        )
    )
    out = normalize.dedup_first_seen(df)
    rows = {r["News_link"]: r["News_title"] for r in out.collect()}
    assert len(rows) == 2
    assert rows["https://www.phocuswire.com/dup"] == "first"


def test_full_pipeline_schema(spark):
    out = normalize.normalize_pipeline(
        raw_df(spark, [base_row()]), watermark="2025-07-01T00:00:00"
    )
    assert out.columns == [
        "Article_id",
        "News_link",
        "News_title",
        "Author_name",
        "News_published_time",
        "Source_name",
        "Processed_at",
    ]
    row = out.first()
    assert row["Processed_at"] is not None


def test_skift_iso_dates_and_absolute_hrefs(spark):
    out = normalize.normalize_listing(
        raw_df(
            spark,
            [
                base_row(
                    source_name="Skift",
                    raw_href="https://skift.com/news/x",
                    raw_date="2025-07-31T17:48:19+00:00",
                )
            ],
        )
    ).first()
    assert out["News_link"] == "https://skift.com/news/x"
    assert str(out["News_published_time"]) == "2025-07-31 17:48:19"
