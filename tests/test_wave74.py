"""Invariants for wave 74 (group-sequential monitoring)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_group_sequential_matches_numpy(spark):
    rows = sorted(
        REGISTRY["events_group_sequential"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.look,
    )
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value").collect()
    weekly = defaultdict(float)  # (user, wk)
    for e in ev:
        wk = min((e.ts.day - 1) // 8, 3)
        weekly[(e.user_id, wk)] += e.value
    bounds = [4.048591, 2.862786, 2.337455, 2.024295]
    assert [r.look for r in rows] == [1, 2, 3, 4]
    prev_bound = float("inf")
    for r in rows:
        look = r.look - 1
        cum = defaultdict(float)
        for (u, wk), v in weekly.items():
            if wk <= look:
                cum[u] += v
        cum = {u: round(v, 6) for u, v in cum.items()}
        g1 = np.array([v for u, v in cum.items() if u % 2 == 1])
        g0 = np.array([v for u, v in cum.items() if u % 2 == 0])
        diff = g1.mean() - g0.mean()
        se = math.sqrt(g1.var() / len(g1) + g0.var() / len(g0))
        assert r.n_users == len(g1) + len(g0)
        assert abs(r.diff - diff) < 1e-3
        assert abs(r.z - diff / se) < 1e-2
        assert abs(r.obf_bound - bounds[look]) < 1e-6
        assert r.crossed == (abs(r.z) > r.obf_bound)
        # OBF bounds shrink monotonically toward the final look
        assert r.obf_bound < prev_bound
        prev_bound = r.obf_bound
