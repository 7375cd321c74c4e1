"""Invariants for wave 140 (watermark detection)."""

from __future__ import annotations

import hashlib
import math

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _green(term: str) -> bool:
    return int(hashlib.md5(f"wmkey7-{term}".encode()).hexdigest()[0], 16) % 2 == 0


def test_watermark_accounting_matches_python(spark):
    rows = {
        r.doc_id: r
        for r in REGISTRY["text_watermark_greenlist_detect"].fn(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    n_flagged = 0
    for d in docs:
        toks = d.text.split()
        g = sum(1 for w in toks if _green(w))
        r = rows[d.doc_id]
        assert (r.n_tokens, r.n_green) == (len(toks), g)
        if toks:
            z = round((g - len(toks) / 2) / math.sqrt(len(toks) / 4), 6)
            assert abs(r.z_green - z) < 1e-9
            assert r.flagged_watermarked == (z > 2.0)
            n_flagged += r.flagged_watermarked
    # un-watermarked corpus: flag rate sits near the ~2% false-positive
    # level of a one-sided z>2 test, never a mass trigger
    assert n_flagged <= 0.1 * len(docs)


def test_watermark_detects_planted_green_text(spark):
    # a doc made ONLY of green tokens must cross the threshold
    corpus_terms = set()
    for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()[:50]:
        corpus_terms.update(d.text.split())
    greens = [w for w in corpus_terms if _green(w)][:20]
    assert len(greens) >= 10
    n = len(greens)
    z = (n - n / 2) / math.sqrt(n / 4)
    assert z > 2.0  # the detector fires on fully-green text of this length
