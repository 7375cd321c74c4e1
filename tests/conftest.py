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


_QUERY_DF_CACHE: dict[tuple[str, str], object] = {}


def build_query_df(spark, name: str, sf_dir: str = SF_SMOKE):
    """Build a registry query's DataFrame once per suite run.

    Building is NOT free — iterative queries execute their eager
    localCheckpoints at build time — and three suite modules
    (test_contract, test_plan_shapes, test_plan_hygiene) each sweep the
    registry; unshared, the whole registry was built three times over
    (~10 min of the suite's wall). Failures are not cached, so a flaky
    construction re-raises in every test that touches it."""
    key = (name, sf_dir)
    if key not in _QUERY_DF_CACHE:
        from news_ingestion_data_pipeline_spark.plans import REGISTRY

        _QUERY_DF_CACHE[key] = REGISTRY[name].fn(spark, sf_dir)
    return _QUERY_DF_CACHE[key]
