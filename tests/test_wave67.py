"""Invariants for wave 67 (apportionment, Fisher exact)."""

from __future__ import annotations

import math
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE

SF_MED = "/root/testdata/sf0.01"


def test_apportionment_sums_to_budget(spark):
    rows = REGISTRY["curation_epoch_apportionment"].fn(spark, SF_SMOKE).collect()
    assert sum(r.n_docs_budget for r in rows) == 10_000
    for r in rows:
        # Hamilton: each source gets floor(q) or floor(q)+1
        assert r.n_docs_budget in (math.floor(r.exact_quota), math.floor(r.exact_quota) + 1)
        assert r.got_remainder == (r.n_docs_budget == math.floor(r.exact_quota) + 1)
    assert abs(sum(r.exact_quota for r in rows) - 10_000) < 1e-3


def test_fisher_exact_matches_scipy_formula(spark):
    # sf0.001 is degenerate (every user converts); use sf0.01 where the
    # 2x2 table has mass in all cells
    [r] = REGISTRY["agg_fisher_exact_2x2"].fn(spark, SF_MED).collect()
    ev = load_table(spark, SF_MED, "events").select("user_id", "event_type").collect()
    conv = defaultdict(int)
    for e in ev:
        if e.event_type == "purchase":
            conv[e.user_id] = 1
        conv.setdefault(e.user_id, 0)
    a = sum(1 for u, c in conv.items() if u % 2 == 1 and c == 1)
    b = sum(1 for u, c in conv.items() if u % 2 == 1 and c == 0)
    c = sum(1 for u, cv in conv.items() if u % 2 == 0 and cv == 1)
    d = sum(1 for u, cv in conv.items() if u % 2 == 0 and cv == 0)
    assert (r.a, r.b, r.c, r.d) == (a, b, c, d)

    def logpmf(k):
        lf = math.lgamma
        fa = lambda x: lf(x + 1)  # noqa: E731
        return (
            fa(a + b) + fa(c + d) + fa(a + c) + fa(b + d)
            - fa(a + b + c + d) - fa(k) - fa(a + b - k) - fa(a + c - k)
            - fa(d - a + k)
        )

    lo, hi = max(0, a - d), min(a + b, a + c)
    p_obs = math.exp(logpmf(a))
    p2 = sum(
        math.exp(logpmf(k))
        for k in range(lo, hi + 1)
        if logpmf(k) <= logpmf(a) + 1e-7
    )
    assert abs(r.p_observed_table - p_obs) < 1e-5
    assert abs(r.p_two_sided - p2) < 1e-3
    assert 0.0 < r.p_two_sided <= 1.0 + 1e-6
    assert r.p_observed_table <= r.p_two_sided + 1e-9
