"""Invariants for wave 106 (collation suite, TPC-H refresh cycle)."""

from __future__ import annotations

from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_collation_collapses_case_forms(spark):
    rows = REGISTRY["scalar_collation_suite"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    per = defaultdict(lambda: [0, set()])
    for d in docs:
        m = d.doc_id % 3
        h = (
            d.source.upper()
            if m == 0
            else d.source
            if m == 1
            else d.source[0].upper() + d.source[1:]
        )
        per[d.source][0] += 1
        per[d.source][1].add(h)
    assert {r.key for r in rows} == set(per)
    for r in rows:
        n, forms = per[r.key]
        assert (r.n_docs, r.n_case_forms) == (n, len(forms))
        assert r.dim_matched == (int(r.key[3:]) % 2 == 0)
        # every source yields at least 2 distinct case forms
        assert r.n_case_forms >= 2


def test_refresh_cycle_counts(spark):
    rows = REGISTRY["pipeline_tpch_refresh_cycle"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    mx = max(o.o_orderkey for o in orders)
    cutoff = mx // 20
    inserted = [o for o in orders if o.o_orderkey % 10 == 1]
    survived = defaultdict(lambda: [0, 0.0])
    for o in orders:
        if o.o_orderkey > cutoff:
            survived[o.o_orderpriority][0] += 1
            survived[o.o_orderpriority][1] += round(o.o_totalprice, 2)
    for o in inserted:  # new keys are all > cutoff by construction
        survived[o.o_orderpriority][0] += 1
        survived[o.o_orderpriority][1] += round(o.o_totalprice, 2)
    n_deleted = sum(1 for o in orders if o.o_orderkey <= cutoff)
    assert {r.o_orderpriority for r in rows} == set(survived)
    for r in rows:
        n, rev = survived[r.o_orderpriority]
        assert r.n_orders == n
        assert abs(r.total_revenue - rev) < 1e-3
        assert r.n_inserted == len(inserted)
        assert r.n_deleted == n_deleted
    assert rows[0].n_deleted > 0 and rows[0].n_inserted > 0
