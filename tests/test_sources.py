"""Source framework tests: HTML extraction, the news_listing Python Data
Source (watermark scan-pruning), and the end-to-end ingestion run
(SURVEY.md §5.2.4 fixture tests + §7 Phases 2-3).
"""

from __future__ import annotations

import os

import pytest

from news_ingestion_data_pipeline_spark import ingest
from news_ingestion_data_pipeline_spark.operators import upsert
from news_ingestion_data_pipeline_spark.sources import html_extract, listing
from news_ingestion_data_pipeline_spark.schemas import RAW_LISTING_SCHEMA
from tests.conftest import FIXTURES

PW_DIR = os.path.join(FIXTURES, "html", "phocuswire")
SK_DIR = os.path.join(FIXTURES, "html", "skift")


def read_page(d, n):
    with open(os.path.join(d, f"page_{n}.html"), encoding="utf-8") as f:
        return f.read()


# ---- html_extract ----------------------------------------------------------

def test_selector_engine_basics():
    root = html_extract.parse_html(
        '<div class="a"><p class="x y">one</p><span><p class="x">two</p></span></div>'
    )
    assert [n.text for n in html_extract.select(root, "div.a p.x")] == ["one", "two"]
    assert [n.text for n in html_extract.select(root, "div.a > p.x")] == ["one"]
    assert html_extract.select_one(root, "p.x.y").text == "one"
    assert html_extract.select_one(root, "p.z") is None


def test_phocuswire_extraction_shapes():
    rows = html_extract.extract_listing("Phocuswire", read_page(PW_DIR, 1), 1)
    assert len(rows) == 6
    good = rows[0]
    assert good["raw_title"] == "Newest article"
    assert good["raw_href"] == "//newest-article-aug2"  # reference's base+'/'+href
    assert good["raw_author"] == "By Abby Crotty"
    assert good["raw_date"] == "August 2, 2025"
    assert rows[2]["raw_title"] is None  # missing title anchor
    assert rows[4]["raw_author"] is None  # missing span.name
    assert rows[4]["raw_date"] == "July 31, 2025"
    assert rows[5]["raw_date"] == "not a real date"


def test_skift_extraction_shapes():
    rows = html_extract.extract_listing("Skift", read_page(SK_DIR, 1), 1)
    assert len(rows) == 5
    assert rows[0]["raw_href"] == "https://skift.com/2025/08/02/ai-travel/"
    assert rows[1]["raw_date"] == "2025-08-01T17:48:19-04:00"  # tz kept raw here
    assert rows[2]["raw_href"] is None  # anchor without href
    assert rows[3]["raw_author"] is None  # no byline anchor
    assert rows[4]["raw_date"] is None  # no <time>


# ---- news_listing data source ---------------------------------------------

def test_listing_schema_matches_declared(spark):
    from pyspark.sql.types import StructType

    ddl = StructType.fromDDL(listing.RAW_LISTING_DDL)
    assert [(f.name, f.dataType) for f in ddl.fields] == [
        (f.name, f.dataType) for f in RAW_LISTING_SCHEMA.fields
    ]


def test_full_scan_reads_all_pages(spark):
    df = listing.read_listing(spark, "Phocuswire", pages_dir=PW_DIR)
    assert df.count() == 9  # 6 on page 1 + 3 on page 2, no watermark
    assert set(r["page_no"] for r in df.collect()) == {1, 2}


def test_watermark_early_stop(spark):
    # watermark 2025-07-30: page-2 'Old article (Jul 20)' triggers the stop —
    # it and everything after it is never emitted; the boundary (Jul 30) row
    # before it IS emitted (strict <).
    df = listing.read_listing(
        spark, "Phocuswire", watermark="2025-07-30T00:00:00", pages_dir=PW_DIR
    )
    titles = [r["raw_title"] for r in df.collect()]
    assert "Boundary article" in titles
    assert "Old article past the watermark" not in titles
    assert "Never reached after early stop" not in titles
    assert len(titles) == 7  # all 6 of page 1 + boundary row


def test_duplicate_and_malformed_rows_skip_date_check(spark):
    # A duplicate URL older than the watermark must NOT stop the scan
    # (reference continues before the date check). Page 1's duplicate row is
    # dated Aug 2 ≥ wm anyway; the malformed rows (no title/href) carry dates
    # but never reach the cutoff logic. Scan proceeds to page 2.
    df = listing.read_listing(
        spark, "Skift", watermark="2025-07-20T00:00:00", pages_dir=SK_DIR
    )
    hrefs = [r["raw_href"] for r in df.collect()]
    assert "https://skift.com/2025/07/30/boundary/" in hrefs  # page 2 reached
    assert "https://skift.com/2025/07/19/ancient/" not in hrefs  # stop row


# ---- end-to-end ingestion ---------------------------------------------------

@pytest.fixture()
def two_sources():
    return [
        ingest.SourceSpec("Skift", {"pages_dir": SK_DIR}),
        ingest.SourceSpec("Phocuswire", {"pages_dir": PW_DIR}),
    ]


def test_ingestion_full_then_incremental(spark, tmp_path, two_sources):
    table = os.path.join(str(tmp_path), "articles")

    # run 1: empty sink → full load from the default watermark (2025-07-25)
    r1 = ingest.run_ingestion(spark, two_sources, table)
    assert r1.is_incremental is False
    tbl = upsert.read_articles(spark, table)
    links = {r["News_link"] for r in tbl.collect()}
    # malformed rows dropped (F1/F2), duplicate deduped (F4), sub-watermark
    # rows pruned at the source (Jul 19/20 < Jul 25)
    assert "https://skift.com/2025/07/19/ancient/" not in links
    assert "https://www.phocuswire.com//old-article-jul20" not in links
    assert "https://www.phocuswire.com//newest-article-aug2" in links
    assert "https://skift.com/2025/07/30/boundary/" in links
    # bad-date article admitted with NULL ts (SURVEY.md §1.4.4)
    bad = tbl.filter(tbl.News_link == "https://www.phocuswire.com//bad-date-article")
    assert bad.count() == 1 and bad.first()["News_published_time"] is None
    n_after_first = tbl.count()
    assert r1.rows_upserted == n_after_first

    # run 2: incremental from max(ts)=Aug 2 → only boundary-day (Aug 2) rows
    # re-ingested; table size unchanged (keyed upsert idempotence)
    r2 = ingest.run_ingestion(spark, two_sources, table)
    assert r2.is_incremental is True
    assert r2.watermark == "2025-08-02T00:00:00"
    tbl2 = upsert.read_articles(spark, table)
    assert tbl2.count() == n_after_first
    assert r2.rows_upserted >= 1  # Aug-2 boundary rows re-upserted

    # top-N answer: newest first
    top = r2.top_articles.collect()
    assert top[0]["News_published_time"].startswith("2025-08-02")


def test_top_articles_presented_format(spark, tmp_path, two_sources):
    table = os.path.join(str(tmp_path), "articles2")
    rep = ingest.run_ingestion(spark, two_sources, table, top_n=3)
    rows = rep.top_articles.collect()
    assert len(rows) == 3
    for r in rows:
        if r["News_published_time"] is not None:
            assert "T" in r["News_published_time"]
        assert "T" not in r["Processed_at"]


def test_fetch_options_round_trip_headers_and_politeness():
    """Per-source headers + retry/politeness knobs plumb through the
    data-source options dict exactly as given (reference parity: each
    source passes its own headers/delays,
    PhocusWire/PhocusWireSource.py:58-82, 206-209)."""
    import json

    from news_ingestion_data_pipeline_spark.sources.fetch import (
        DEFAULT_HEADERS,
        make_fetcher,
    )

    opts = {
        "url_template": "https://x.test/news?pg={page}",
        "headers": json.dumps(
            {"User-Agent": "custom-agent/2.0", "Accept-Language": "en-GB"}
        ),
        "max_retries": "5",
        "backoff_factor": "0.5",
        "timeout_s": "7",
        "min_delay_s": "0.2",
        "max_delay_s": "0.4",
    }
    f = make_fetcher(opts)
    assert f.headers["User-Agent"] == "custom-agent/2.0"  # override wins
    assert f.headers["Accept-Language"] == "en-GB"  # new key added
    for k in DEFAULT_HEADERS:
        assert k in f.headers  # defaults survive under the overlay
    assert f.policy.max_retries == 5
    assert f.policy.backoff_factor == 0.5
    assert f.policy.timeout_s == 7.0
    assert (f.policy.min_delay_s, f.policy.max_delay_s) == (0.2, 0.4)


def test_fetch_default_headers_without_option():
    from news_ingestion_data_pipeline_spark.sources.fetch import (
        DEFAULT_HEADERS,
        make_fetcher,
    )

    f = make_fetcher({"url_template": "https://x.test/?pg={page}"})
    assert f.headers == DEFAULT_HEADERS
