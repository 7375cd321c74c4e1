"""Invariants for wave 88 (Cohen's kappa)."""

from __future__ import annotations

from collections import Counter

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_cohens_kappa_matches_python(spark):
    [r] = REGISTRY["agg_cohens_kappa"].fn(spark, SF_SMOKE).collect()
    pred = REGISTRY["text_lang_id"].fn(spark, SF_SMOKE).collect()
    n = len(pred)
    po = sum(1 for p in pred if p.actual_lang == p.pred_lang) / n
    ca = Counter(p.actual_lang for p in pred)
    cp = Counter(p.pred_lang for p in pred)
    pe = sum(ca[c] * cp.get(c, 0) for c in ca) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert r.n_docs == n
    assert abs(r.observed_agreement - po) < 1e-6
    assert abs(r.chance_agreement - pe) < 1e-6
    assert abs(r.cohens_kappa - kappa) < 1e-5
    # kappa never exceeds raw agreement's headroom and is <= 1
    assert r.cohens_kappa <= 1.0 + 1e-9
    assert r.cohens_kappa <= r.observed_agreement / (1 - r.chance_agreement) + 1e-9
