"""Invariants for wave 153 (freshness alerting)."""

from __future__ import annotations

from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_freshness_alert_matches_python(spark):
    rows = {
        r.source: r
        for r in REGISTRY["pipeline_source_freshness_alert"].fn(spark, SF_SMOKE).collect()
    }
    per = defaultdict(lambda: [0, 0])
    for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect():
        p = per[d.source]
        p[0] = max(p[0], d.doc_id)
        p[1] += 1
    frontier = max(w for w, _ in per.values())
    assert set(rows) == set(per)
    breached = 0
    for src, (w, n) in per.items():
        r = rows[src]
        assert (r.watermark, r.n_docs) == (w, n)
        assert r.lag_behind_frontier == frontier - w
        assert r.sla_breached == (frontier - w > 40)
        breached += r.sla_breached
    # at least one source sits AT the frontier (lag 0, never breached)
    assert any(r.lag_behind_frontier == 0 for r in rows.values())
