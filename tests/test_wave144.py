"""Invariants for wave 144 (Ljung-Box, audit hash chain)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_ljung_box_positive_and_consistent(spark):
    row = REGISTRY["agg_ljung_box"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_lags == 10
    assert row.n_obs > 100
    # Q is a sum of squares scaled by positive factors
    assert row.ljung_box_q >= 0
    # hourly Poisson-ish counts: Q should be same order as its chi2 dof,
    # not astronomically structured
    assert row.ljung_box_q < 50 * row.n_lags


def test_hash_chain_matches_python_and_detects_tamper(spark):
    row = REGISTRY["pipeline_audit_hash_chain"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    monthly = defaultdict(list)
    for o in orders:
        monthly[(o.o_orderdate.year, o.o_orderdate.month)].append(
            (o.o_orderkey, o.o_custkey, f"{round(o.o_totalprice, 2):.2f}")
        )
    digests = []
    for m in sorted(monthly):
        rows_sorted = sorted(monthly[m])
        concat = "".join(
            hashlib.md5(f"{k}|{c}|{p}".encode()).hexdigest()
            for k, c, p in rows_sorted
        )
        digests.append(hashlib.md5(concat.encode()).hexdigest())
    head = "GENESIS"
    for d in digests:
        head = hashlib.md5((head + d).encode()).hexdigest()
    assert row.n_batches == len(digests)
    assert row.first_digest == digests[0]
    assert row.last_digest == digests[-1]
    assert row.chain_head == head
    # tamper check: a one-cent edit in the FIRST month flips the head
    k, c, p = sorted(monthly[sorted(monthly)[0]])[0]
    tampered = digests[:]
    concat = hashlib.md5(f"{k}|{c}|{float(p) + 0.01:.2f}".encode()).hexdigest()
    tampered[0] = hashlib.md5(concat.encode()).hexdigest()
    h2 = "GENESIS"
    for d in tampered:
        h2 = hashlib.md5((h2 + d).encode()).hexdigest()
    assert h2 != head
