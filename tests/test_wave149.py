"""Invariants for wave 149 (content-defined chunking)."""

from __future__ import annotations

import hashlib
import re
from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE

_POLY = [623063367, 336663071, 168429323, 67503107, 16974593, 66049, 257, 1]
_MOD = 2147483647


def _norm(text):
    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    return re.sub(r"\s+", " ", t).strip()


def _chunks(s):
    L = len(s)
    codes = [ord(c) for c in s]
    cpts = [0]
    if L >= 8:
        for j in range(1, L - 6):  # 1-based start positions
            h = sum(codes[j - 1 + i] * c for i, c in enumerate(_POLY)) % _MOD
            if h % 32 == 0:
                cpts.append(j + 7)
    cpts.append(L)
    out = []
    for a, b in zip(cpts, cpts[1:]):
        if b > a:
            out.append(s[a:b])
    return out


def test_cdc_matches_python_and_resyncs(spark):
    rows = {
        r.doc_id: r
        for r in REGISTRY["dedup_cdc_chunks"].fn(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    per_doc = {}
    for d in docs:
        s = _norm(d.text)
        per_doc[d.doc_id] = (s, _chunks(s))
    # shared = chunk hash seen in >= 2 distinct docs
    seen_docs = {}
    for did, (_, cs) in per_doc.items():
        for c in cs:
            seen_docs.setdefault(
                hashlib.md5(c.encode()).hexdigest(), set()
            ).add(did)
    shared = {h for h, ds in seen_docs.items() if len(ds) >= 2}
    for did, (s, cs) in per_doc.items():
        if not cs:
            assert did not in rows
            continue
        r = rows[did]
        assert r.total_chars == len(s)
        assert r.n_chunks == len(cs)
        n_sh = sum(
            1
            for c in cs
            if hashlib.md5(c.encode()).hexdigest() in shared
        )
        sh_chars = sum(
            len(c)
            for c in cs
            if hashlib.md5(c.encode()).hexdigest() in shared
        )
        assert (r.n_shared, r.shared_chars) == (n_sh, sh_chars)
        assert r.dedup_ratio_milli == (1000 * sh_chars) // len(s)
    # the shared-vocabulary corpus must exhibit real chunk sharing
    assert shared
