"""Golden-output tests against the reference's shipped corpus (SURVEY.md §5.2.1).

The de-facto golden dataset is /root/reference/data/articles.db (97 scraped
rows). tools/make_fixtures.py exported it to tests/fixtures/articles.parquet.
Oracles here are computed live from the SQLite file with stdlib sqlite3 —
the exact engine the reference used — so our Spark answers are compared
against the reference's own query results, not re-derived expectations.
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import topn, watermark
from tests.conftest import REF_DB


@pytest.fixture(scope="module")
def ref_conn():
    con = sqlite3.connect(REF_DB)
    yield con
    con.close()


def test_corpus_shape(golden_articles, ref_conn):
    counts = dict(
        ref_conn.execute(
            "SELECT Source_name, COUNT(*) FROM articles GROUP BY Source_name"
        ).fetchall()
    )
    got = {
        r["Source_name"]: r["n"]
        for r in golden_articles.groupBy("Source_name").agg(F.count("*").alias("n")).collect()
    }
    assert got == counts
    assert golden_articles.count() == 97


def test_article_ids_are_md5_of_links(golden_articles):
    # X1 parity on real data: every stored id == md5(News_link)
    bad = golden_articles.filter(
        F.md5(F.col("News_link")) != F.col("Article_id")
    ).count()
    assert bad == 0


def test_topn_matches_sqlite(golden_articles, ref_conn):
    # reference: Database.query_topn_articles (ORDER BY News_published_time
    # DESC LIMIT n on ISO-8601 TEXT ≡ temporal ordering on timestamps).
    for n in (5, 10, 25):
        expected = ref_conn.execute(
            "SELECT Article_id, News_published_time FROM articles "
            "ORDER BY News_published_time DESC, Article_id LIMIT ?",
            (n,),
        ).fetchall()
        got = [
            (r["Article_id"], r["News_published_time"])
            for r in topn.top_n_articles_presented(golden_articles, n).collect()
        ]
        assert [(a, t) for a, t, in got] == [(a, t) for a, t in expected]


def test_watermark_matches_sqlite(golden_articles, ref_conn):
    # reference: Database.get_latest_news_time — MAX + day truncation.
    (max_txt,) = ref_conn.execute(
        "SELECT MAX(News_published_time) FROM articles"
    ).fetchone()
    wm, incremental = watermark.latest_news_time(golden_articles)
    assert incremental is True
    assert wm.strftime("%Y-%m-%dT00:00:00") == max_txt[:10] + "T00:00:00"
    assert (wm.hour, wm.minute, wm.second, wm.microsecond) == (0, 0, 0, 0)


def test_watermark_default_when_empty(spark, golden_articles):
    empty = golden_articles.limit(0)
    wm, incremental = watermark.latest_news_time(empty)
    assert incremental is False
    assert wm.isoformat() == "2025-07-25T00:00:00"
    wm2, inc2 = watermark.latest_news_time(None)
    assert (wm2, inc2) == (wm, False)


def test_presented_formats_roundtrip_sqlite_text(golden_articles, ref_conn):
    # Byte-identical presentation: published with 'T', processed with space.
    expected = {
        row[0]: (row[1], row[2])
        for row in ref_conn.execute(
            "SELECT Article_id, News_published_time, Processed_at FROM articles"
        ).fetchall()
    }
    got = topn.top_n_articles_presented(golden_articles, 97).collect()
    assert len(got) == 97
    for r in got:
        exp_pub, exp_proc = expected[r["Article_id"]]
        assert r["News_published_time"] == exp_pub
        assert r["Processed_at"] == exp_proc
