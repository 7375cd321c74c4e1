"""Invariants for wave 119 (unigram Viterbi segmentation)."""

from __future__ import annotations

import math
import re
from collections import Counter

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _viterbi_py(word, cost):
    L = len(word)
    best = [(0, 0)]  # (cost_e9, pieces)
    for j in range(1, L + 1):
        cands = []
        for k in range(1, min(4, j) + 1):
            pc, pp = best[j - k]
            cands.append((pc + cost[word[j - k : j]], pp + 1))
        best.append(min(cands))
    return best[L]


def test_viterbi_matches_python_dp(spark):
    rows = REGISTRY["text_unigram_viterbi_segment"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    words = Counter()
    for d in docs:
        t = re.sub(r"[^a-z0-9\s]", " ", d.text.lower())
        words.update(w for w in re.split(r"\s+", t.strip()) if w)
    vocab = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for k in range(1, 5):
                if i + k <= len(w):
                    vocab[w[i : i + k]] += f
    n_total, v = sum(vocab.values()), len(vocab)
    cost = {
        p: round(-math.log2((c + 1) / (n_total + v)) * 1e9)
        for p, c in vocab.items()
    }
    assert len(rows) == len(words)
    for r in rows:
        bc, np_ = _viterbi_py(r.word, cost)
        assert r.freq == words[r.word]
        assert r.n_chars == len(r.word)
        assert (r.best_cost_e9, r.n_pieces) == (bc, np_), r.word
        # segmentation never worse than the single-char split
        singles = sum(cost[ch] for ch in r.word)
        assert r.best_cost_e9 <= singles
        assert 1 <= r.n_pieces <= r.n_chars
