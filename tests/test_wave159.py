"""Invariants for wave 159 (Gopher rule battery, DSIR importance)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter
from decimal import Decimal

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE

STOP = None


def _stop():
    global STOP
    if STOP is None:
        from news_ingestion_data_pipeline_spark.functions.text import (
            QUALITY_STOPWORDS,
        )
        STOP = set(QUALITY_STOPWORDS)
    return STOP


def _toks(text):
    return [w for w in re.split(r"\s+", text.strip().lower()) if w]


def test_gopher_rules_match_python(spark):
    rows = {
        r.doc_id: r
        for r in REGISTRY["curation_gopher_quality_rules"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    assert len(rows) == len(docs)
    n_keep = 0
    for d in docs:
        tk = _toks(d.text)
        n = len(tk)
        sum_len = sum(len(w) for w in tk)
        r = rows[d.doc_id]
        assert r.n_words == n
        assert r.ok_word_count == (50 <= n <= 100_000)
        assert r.ok_mean_word_len == (
            n > 0 and 3 * n <= sum_len <= 10 * n
        )
        assert r.ok_stopwords == (sum(w in _stop() for w in tk) >= 2)
        assert r.ok_alpha_fraction == (
            5 * sum(bool(re.search("[a-z]", w)) for w in tk) >= 4 * n
        )
        expected_keep = all(
            [r.ok_word_count, r.ok_mean_word_len, r.ok_max_word_len,
             r.ok_stopwords, r.ok_alpha_fraction, r.ok_symbol_ratio]
        )
        assert r.keep == expected_keep
        n_keep += r.keep
    # the battery must discriminate on this corpus, not rubber-stamp
    assert 0 < n_keep < len(docs)


def _bkt(w1, w2):
    return int(hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:3], 16)


def test_dsir_scores_match_python(spark):
    out = {
        r.doc_id: r
        for r in REGISTRY["curation_dsir_importance"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    raw, tgt = Counter(), Counter()
    per_doc = {}
    for d in docs:
        tk = _toks(d.text)
        bks = [_bkt(a, b) for a, b in zip(tk, tk[1:])]
        per_doc[d.doc_id] = bks
        raw.update(bks)
        if d.lang == "en":
            tgt.update(bks)
    n_r, n_t = sum(raw.values()), sum(tgt.values())
    lam = {
        b: Decimal(
            str(
                round(
                    math.log2((tgt.get(b, 0) + 1.0) / (n_t + 4096))
                    - math.log2((c + 1.0) / (n_r + 4096)),
                    9,
                )
            )
        )
        for b, c in raw.items()
    }
    for d in docs:
        bks = per_doc[d.doc_id]
        r = out[d.doc_id]
        assert r.n_bigrams == len(bks)
        expect = sum((lam[b] for b in bks), Decimal(0))
        assert abs(r.dsir_score - float(expect)) < 1e-9, d.doc_id
        assert r.selected == (expect >= 0)
    # English docs should score higher on average than non-English
    en = [out[d.doc_id].dsir_score for d in docs if d.lang == "en"]
    other = [out[d.doc_id].dsir_score for d in docs if d.lang != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)
