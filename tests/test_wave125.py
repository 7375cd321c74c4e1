"""Invariants for wave 125 (exact Shapley attribution)."""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal
from math import factorial

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE

_CH = {"click": 0, "error": 1, "signup": 2, "view": 3}


def _coalitions(spark):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type"
    ).collect()
    users = defaultdict(lambda: [0, 0])
    for e in ev:
        u = users[e.user_id]
        if e.event_type == "purchase":
            u[1] = 1
        elif e.event_type in _CH:
            u[0] |= 1 << _CH[e.event_type]
    v = defaultdict(lambda: [0, 0])
    for mask, conv in users.values():
        v[mask][0] += 1
        v[mask][1] += conv
    return {
        m: Decimal(str(round(c / n, 9))) for m, (n, c) in v.items()
    }


def test_shapley_matches_python_and_efficiency(spark):
    rows = {
        r.channel: r.shapley
        for r in REGISTRY["events_shapley_attribution"].fn(spark, SF_SMOKE).collect()
    }
    v = _coalitions(spark)
    n = 4
    phi = {}
    for name, i in _CH.items():
        num = Decimal(0)
        for s in range(16):
            if (s >> i) % 2:
                continue
            k = bin(s).count("1")
            w = factorial(k) * factorial(n - k - 1)
            num += w * (v.get(s + (1 << i), Decimal(0)) - v.get(s, Decimal(0)))
        phi[name] = float(num) / factorial(n)
    for name in _CH:
        assert abs(rows[name] - phi[name]) < 1e-12
    # efficiency axiom: sum of credits = v(grand) - v(empty)
    total = sum(phi.values())
    grand = float(v.get(15, Decimal(0))) - float(v.get(0, Decimal(0)))
    assert abs(total - grand) < 1e-9
