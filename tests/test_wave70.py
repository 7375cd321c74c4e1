"""Invariants for wave 70 (reciprocity, entropy rate, filter funnel)."""

from __future__ import annotations

import math
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _transitions(spark, drop_self):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    counts = defaultdict(int)
    for es in by_user.values():
        es.sort(key=lambda e: (e.ts, e.event_id))
        for prev, cur in zip(es, es[1:]):
            if not (drop_self and prev.event_type == cur.event_type):
                counts[(prev.event_type, cur.event_type)] += 1
    return counts


def test_reciprocity_matches_python(spark):
    [r] = REGISTRY["graph_reciprocity"].fn(spark, SF_SMOKE).collect()
    counts = _transitions(spark, drop_self=True)
    total = sum(counts.values())
    recip_w = sum(min(w, counts.get((d, s), 0)) for (s, d), w in counts.items())
    recip_e = sum(1 for (s, d) in counts if (d, s) in counts)
    assert r.n_directed_edges == len(counts)
    assert r.total_weight == total
    assert abs(r.weighted_reciprocity - recip_w / total) < 1e-6
    assert abs(r.edge_reciprocity - recip_e / len(counts)) < 1e-6
    assert 0.0 <= r.weighted_reciprocity <= 1.0


def test_entropy_rate_matches_python(spark):
    [r] = REGISTRY["events_entropy_rate"].fn(spark, SF_SMOKE).collect()
    counts = _transitions(spark, drop_self=False)
    row = defaultdict(int)
    for (s, _), w in counts.items():
        row[s] += w
    total = sum(counts.values())
    h = -sum(
        w / total * math.log2(w / row[s]) for (s, _), w in counts.items()
    )
    assert r.n_states == len(row)
    assert r.n_transitions == total
    assert abs(r.entropy_rate_bits - h) < 1e-4
    assert 0.0 <= r.entropy_rate_bits <= r.max_entropy_bits + 1e-9
    assert abs(r.max_entropy_bits - math.log2(len(row))) < 1e-4
    assert abs(r.predictability_ratio - h / math.log2(len(row))) < 1e-3


def test_filter_funnel_monotone_and_consistent(spark):
    rows = sorted(
        REGISTRY["curation_filter_funnel"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.stage_idx,
    )
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert [r.stage for r in rows] == [
        "non_empty",
        "length",
        "quality_bundle",
        "exact_dedup",
        "near_dedup",
    ]
    assert rows[0].docs_in == n_docs
    for prev, cur in zip(rows, rows[1:]):
        assert cur.docs_in == prev.docs_out  # funnel chains
    for r in rows:
        assert 0 <= r.docs_out <= r.docs_in
        assert r.dropped == r.docs_in - r.docs_out
        assert abs(r.drop_rate - r.dropped / r.docs_in) < 1e-6
    # the quality gate must be consistent with its registered source
    q = REGISTRY["curation_quality_filter"].fn(spark, SF_SMOKE).collect()
    passed_all = sum(1 for x in q if x.passed)
    assert rows[2].docs_out <= passed_all
