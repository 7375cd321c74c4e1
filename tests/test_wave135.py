"""Invariants for wave 135 (bitmap overlap, Mantel-Haenszel)."""

from __future__ import annotations

from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_bitmap_overlap_equals_set_arithmetic(spark):
    rows = REGISTRY["agg_bitmap_audience_overlap"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id"
    ).collect()
    aud = defaultdict(set)
    for e in ev:
        aud[e.event_type].add(e.user_id)
    for r in rows:
        a, b = aud[r.type_a], aud[r.type_b]
        assert r.n_a == len(a) and r.n_b == len(b)
        assert r.n_overlap == len(a & b)
        assert r.n_union == len(a | b)
        assert r.jaccard_milli == (1000 * len(a & b)) // len(a | b)


def test_mantel_haenszel_matches_python(spark):
    from decimal import Decimal

    row = REGISTRY["events_mantel_haenszel"].fn(spark, SF_SMOKE).collect()[0]
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id"
    ).collect()
    per = defaultdict(lambda: [0, 0])  # user -> [n_errors, converted]
    for e in ev:
        if e.event_type == "error":
            per[e.user_id][0] += 1
        elif e.event_type == "purchase":
            per[e.user_id][1] = 1
    cells = defaultdict(lambda: [0, 0, 0, 0, 0])  # a, n1, b, n0, n
    for uid, (ec, conv) in per.items():
        s = uid % 5
        exp = 1 if ec >= 14 else 0
        c = cells[s]
        c[4] += 1
        if exp:
            c[1] += 1
            c[0] += conv
        else:
            c[3] += 1
            c[2] += conv
    num = sum(Decimal(str(round(a * n0 / n, 9))) for a, n1, b, n0, n in cells.values())
    den = sum(Decimal(str(round(b * n1 / n, 9))) for a, n1, b, n0, n in cells.values())
    assert row.n_strata == len(cells)
    assert abs(row.rr_mh - float(num) / float(den)) < 1e-9
    assert row.exposed_conversions == sum(c[0] for c in cells.values())
    assert row.unexposed_conversions == sum(c[2] for c in cells.values())
