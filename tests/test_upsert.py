"""Keyed-upsert (MERGE) semantics + idempotence (SURVEY.md §2.8 K1, §5.2.3).

Reference behavior (database_utils/database_methods.py:68-107): matched keys
update all non-key columns and refresh Processed_at; unmatched insert; rows
not in the batch survive. Re-running the same batch changes nothing except
Processed_at.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row

from news_ingestion_data_pipeline_spark.operators import upsert
from news_ingestion_data_pipeline_spark.schemas import ARTICLE_SCHEMA

TS = dt.datetime(2025, 8, 1, 12, 0, 0)


def art(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                Article_id=r[0],
                News_link=f"https://x/{r[0]}",
                News_title=r[1],
                Author_name=None,
                News_published_time=r[2],
                Source_name="Skift",
                Processed_at=r[3],
            )
            for r in rows
        ],
        ARTICLE_SCHEMA,
    )


def test_merge_update_insert_survive(spark):
    target = art(spark, [("a", "old-a", TS, TS), ("b", "old-b", TS, TS)])
    updates = art(
        spark,
        [("a", "new-a", TS, TS + dt.timedelta(hours=1)),
         ("c", "new-c", TS, TS + dt.timedelta(hours=1))],
    )
    out = {
        r["Article_id"]: (r["News_title"], r["Processed_at"])
        for r in upsert.merge_upsert_frames(target, updates).collect()
    }
    assert set(out) == {"a", "b", "c"}
    assert out["a"][0] == "new-a"  # matched → incoming wins
    assert out["a"][1] == TS + dt.timedelta(hours=1)  # Processed_at refreshed
    assert out["b"] == ("old-b", TS)  # untouched row survives unchanged
    assert out["c"][0] == "new-c"  # unmatched → inserted


def test_upsert_roundtrip_and_idempotence(spark, tmp_path):
    path = os.path.join(str(tmp_path), "articles_tbl")
    batch = art(spark, [("a", "t-a", TS, TS), ("b", "t-b", TS, TS)])
    upsert.upsert_articles(spark, path, batch)
    first = {r["Article_id"]: r for r in spark.read.parquet(path).collect()}
    assert set(first) == {"a", "b"}

    # re-run the identical batch → table unchanged (same Processed_at since
    # the batch carries it; the reference refreshes it via CURRENT_TIMESTAMP
    # which our finalize_articles stamps before the merge)
    upsert.upsert_articles(spark, path, batch)
    second = {r["Article_id"]: r for r in spark.read.parquet(path).collect()}
    assert first == second

    # boundary-day re-ingest: same key, newer Processed_at → refreshed
    newer = art(spark, [("a", "t-a", TS, TS + dt.timedelta(days=1))])
    upsert.upsert_articles(spark, path, newer)
    third = {r["Article_id"]: r for r in spark.read.parquet(path).collect()}
    assert third["a"]["Processed_at"] == TS + dt.timedelta(days=1)
    assert third["b"] == second["b"]


def test_upsert_creates_table_when_missing(spark, tmp_path):
    path = os.path.join(str(tmp_path), "fresh_tbl")
    assert upsert.read_articles(spark, path) is None
    upsert.upsert_articles(spark, path, art(spark, [("z", "t", TS, TS)]))
    assert spark.read.parquet(path).count() == 1
    upsert.drop_table(path)
    assert upsert.read_articles(spark, path) is None
