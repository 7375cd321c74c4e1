"""Shared test fixtures.

One session-scoped SparkSession for the whole suite (JVM spin-up is the
dominant cost); small parallelism + shuffle width keep 97-row and sf0.001
jobs snappy while exercising multi-partition code paths.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_ingestion_data_pipeline_spark import get_spark  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
REF_DB = "/root/reference/data/articles.db"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def golden_articles(spark):
    """The reference's shipped 97-row corpus (data/articles.db → parquet)."""
    return spark.read.parquet(os.path.join(FIXTURES, "articles.parquet")).cache()
