"""Invariants for wave 71 (SPC I-MR chart, mutual information)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_spc_chart_matches_numpy(spark):
    rows = sorted(
        REGISTRY["agg_spc_individuals_chart"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.day,
    )
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "value").collect()
    by_day = defaultdict(list)
    for e in ev:
        by_day[e.ts.strftime("%Y-%m-%d")].append(e.value)
    days = sorted(by_day)
    xs = np.array([np.mean(by_day[d]) for d in days])
    mrs = np.abs(np.diff(xs))
    xbar, mrbar = xs.mean(), mrs.mean()
    assert [r.day for r in rows] == days
    for r, x in zip(rows, xs):
        assert abs(r.x - x) < 1e-4
        assert abs(r.center - xbar) < 1e-4
        assert abs(r.lcl - (xbar - 2.66 * mrbar)) < 1e-3
        assert abs(r.ucl - (xbar + 2.66 * mrbar)) < 1e-3
        assert r.out_of_control == (x < r.lcl or x > r.ucl) or abs(x - r.lcl) < 1e-3 or abs(x - r.ucl) < 1e-3
    assert all(r.lcl < r.center < r.ucl for r in rows)


def test_mutual_information_matches_python(spark):
    [r] = REGISTRY["agg_mutual_information"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    cells = defaultdict(int)
    for es in by_user.values():
        es.sort(key=lambda e: (e.ts, e.event_id))
        p_times = [e.ts for e in es if e.event_type == "purchase"]
        for e in es:
            if e.event_type == "purchase":
                continue
            nxt = [t_ for t_ in p_times if t_ >= e.ts]
            y = 1 if nxt and (nxt[0] - e.ts).total_seconds() <= 86400 else 0
            cells[(e.event_type, y)] += 1
    total = sum(cells.values())
    nx = defaultdict(int)
    ny = defaultdict(int)
    for (x, y), n in cells.items():
        nx[x] += n
        ny[y] += n
    mi = sum(
        n / total * math.log2(n * total / (nx[x] * ny[y]))
        for (x, y), n in cells.items()
    )
    h = -sum(n / total * math.log2(n / total) for n in ny.values())
    assert r.n_feature_values == len(nx)
    assert r.n_rows == total
    assert abs(r.mi_bits - mi) < 1e-4
    assert abs(r.h_outcome_bits - h) < 1e-4
    assert r.mi_bits >= -1e-9  # MI is non-negative
    assert r.mi_bits <= r.h_outcome_bits + 1e-9  # bounded by outcome entropy
    if h > 0:
        assert abs(r.uncertainty_reduction - mi / h) < 1e-3
