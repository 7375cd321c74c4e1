"""Invariants for wave 59 (mixture temperature, time to convert)."""

from __future__ import annotations

import math
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_mixture_temperature_matches_python(spark):
    rows = REGISTRY["curation_mixture_temperature"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "n_chars").collect()
    mass = defaultdict(int)
    n_docs = defaultdict(int)
    for d in docs:
        mass[d.source] += d.n_chars
        n_docs[d.source] += 1
    total = sum(mass.values())
    powed = {s: round(m**0.7, 9) for s, m in mass.items()}
    sp = sum(powed.values())
    assert len(rows) == len(mass)
    w_sum = 0.0
    for r in rows:
        assert r.n_docs == n_docs[r.source]
        assert r.n_chars_total == mass[r.source]
        assert abs(r.natural_share - mass[r.source] / total) < 1e-5
        assert abs(r.temp_weight - powed[r.source] / sp) < 1e-5
        assert abs(r.upsample_factor - (powed[r.source] / sp) / (mass[r.source] / total)) < 1e-4
        w_sum += r.temp_weight
    assert abs(w_sum - 1.0) < 1e-4
    # temperature < 1 compresses the range: big sources down, small up
    big = max(rows, key=lambda r: r.n_chars_total)
    small = min(rows, key=lambda r: r.n_chars_total)
    assert big.upsample_factor <= 1.0 + 1e-9
    assert small.upsample_factor >= 1.0 - 1e-9


def test_time_to_convert_matches_python(spark):
    [r] = REGISTRY["events_time_to_convert"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    fv, fp = {}, {}
    for e in ev:
        if e.event_type == "view":
            fv[e.user_id] = min(fv.get(e.user_id, e.ts), e.ts)
        elif e.event_type == "purchase":
            fp[e.user_id] = min(fp.get(e.user_id, e.ts), e.ts)
    deltas = sorted(
        (fp[u] - fv[u]).total_seconds() / 60
        for u in fv
        if u in fp and fp[u] >= fv[u]
    )
    assert r.n_converted == len(deltas)
    assert abs(r.median_minutes - deltas[(len(deltas) + 1) // 2 - 1]) < 1e-4
    assert abs(r.p90_minutes - deltas[math.ceil(len(deltas) * 0.9) - 1]) < 1e-4
    assert abs(r.mean_minutes - sum(deltas) / len(deltas)) < 1e-3
    assert r.median_minutes <= r.p90_minutes
