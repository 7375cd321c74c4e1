"""Driver-contract smoke tests.

Every REGISTRY query must run at sf0.001 and return a stable schema; every
oracle SQL string must be valid DuckDB SQL over the same tables. The full
value-hash comparison lives in tools/mini_verify.py (and the driver's own
gate at sf0.01); here we keep the fast structural checks that catch
regressions on every pytest run.
"""

from __future__ import annotations

import duckdb
import pytest

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import TABLE_NAMES, table_path
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    # Validity (= parse + bind) is what the oracle tests assert; the
    # optimizer adds nothing to that and takes ~3 min on the deepest
    # unrolled-CTE oracle (curation_kcenter_coreset), so it is off here.
    con.execute("PRAGMA disable_optimizer")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_SMOKE, name)}')"
        )
    yield con
    con.close()


def test_registry_is_nonempty_and_named():
    assert len(REGISTRY) >= 50
    for name, q in REGISTRY.items():
        assert name.replace("_", "").isalnum()
        assert callable(q.fn)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_and_has_schema(spark, name):
    from tests.conftest import build_query_df

    df = build_query_df(spark, name, SF_SMOKE)
    assert df.columns, f"{name} returned no columns"
    assert len(df.columns) == len(set(df.columns)), f"{name} has duplicate columns"
    assert df.count() >= 0


@pytest.mark.parametrize(
    "name", sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
)
def test_oracle_sql_is_valid_duckdb(duck, name):
    # EXPLAIN parses + binds the query without executing it.
    duck.execute(f"EXPLAIN {REGISTRY[name].oracle}")


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)
