"""Invariants for wave 127 (span corruption)."""

from __future__ import annotations

import hashlib

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _layout_py(doc_id: int, n: int):
    masked = spans = remaining = 0
    first = -1
    for i in range(1, n + 1):
        if remaining > 0:
            masked += 1
            remaining -= 1
        elif _h(f"{doc_id}-{i}") % 100 < 12:
            masked += 1
            spans += 1
            remaining = _h(f"{doc_id}~{i}") % 3
            if first == -1:
                first = i
    return masked, spans, first


def test_span_layout_matches_python(spark):
    rows = REGISTRY["text_span_corruption"].fn(spark, SF_SMOKE).collect()
    docs = {
        d.doc_id: len(d.text.split())
        for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    total_m = total_t = 0
    for r in rows:
        n = docs[r.doc_id]
        masked, spans, first = _layout_py(r.doc_id, n)
        assert (r.n_tokens, r.n_masked, r.n_spans, r.first_span_start) == (
            n,
            masked,
            spans,
            first,
        )
        if n:
            assert r.mask_rate_milli == (1000 * masked) // n
            assert r.n_spans <= r.n_masked <= n
        total_m += masked
        total_t += n
    # corpus-level corruption budget lands near the canonical ~15%
    # (12% starts x mean span len 2, minus overlap suppression)
    rate = total_m / total_t
    assert 0.10 < rate < 0.30, rate
