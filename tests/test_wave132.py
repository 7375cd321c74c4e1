"""Invariants for wave 132 (trending terms, totals reconciliation)."""

from __future__ import annotations

import re
from collections import Counter

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_trending_terms_match_python(spark):
    rows = REGISTRY["text_trending_terms"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    cr, cb = Counter(), Counter()
    for d in docs:
        toks = [
            w
            for w in re.split(
                r"\s+", re.sub(r"[^a-z0-9\s]", " ", d.text.lower()).strip()
            )
            if w
        ]
        (cr if d.doc_id % 2 == 1 else cb).update(toks)
    n_r, n_b = sum(cr.values()), sum(cb.values())
    scored = []
    for term in set(cr) | set(cb):
        if cr[term] + cb[term] < 5:
            continue
        lift = round(
            ((cr[term] + 1.0) / (n_r + 1.0)) / ((cb[term] + 1.0) / (n_b + 1.0)),
            9,
        )
        scored.append((-lift, term))
    scored.sort()
    expect = [(t, -l) for l, t in scored[:20]]
    got = [(r.term, round(r.lift, 9)) for r in rows]
    assert got == expect
    for r in rows:
        assert r.c_recent + r.c_base >= 5


def test_totals_reconcile_to_zero(spark):
    rows = REGISTRY["pipeline_totals_reconciliation"].fn(spark, SF_SMOKE).collect()
    assert {r.level for r in rows} == {"daily", "monthly", "yearly"}
    totals = {r.level: r.total_revenue for r in rows}
    assert len(set(totals.values())) == 1  # every level agrees exactly
    for r in rows:
        assert r.delta_vs_grand == 0.0
    by = {r.level: r.n_buckets for r in rows}
    assert by["daily"] >= by["monthly"] >= by["yearly"] >= 1
