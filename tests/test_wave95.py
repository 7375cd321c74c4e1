"""Invariants for waves 95-96 (domain cap, bitemporal as-of, BPE
training loop, rate limiting)."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_domain_cap_arithmetic(spark):
    rows = REGISTRY["curation_domain_cap"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    n = len(docs)
    cap = -(-n * 2 // 100)
    per_source = Counter(d.source for d in docs)
    assert len(rows) == len(per_source)
    for r in rows:
        assert r.cap == cap
        assert r.n_docs == per_source[r.source]
        assert r.n_kept == min(r.n_docs, cap)
        assert r.n_kept + r.n_dropped == r.n_docs
        # kept chars = top-cap docs by (n_chars desc, doc_id)
        top = sorted(
            (d for d in docs if d.source == r.source),
            key=lambda d: (-d.n_chars, d.doc_id),
        )[:cap]
        assert r.kept_chars == sum(d.n_chars for d in top)


def test_bitemporal_believed_state(spark):
    rows = REGISTRY["pipeline_bitemporal_asof"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    T = dt.date(1995, 6, 15)
    want_n = Counter()
    want_rev = defaultdict(float)
    for o in orders:
        od = o.o_orderdate
        if isinstance(od, dt.datetime):
            od = od.date()
        if od > T:
            continue  # order not yet known on T
        k_max = o.o_orderkey % 3
        believed_k = min(k_max, (T - od).days)
        want_n[o.o_orderpriority] += 1
        want_rev[o.o_orderpriority] += round(o.o_totalprice, 2) + believed_k
    assert {r.o_orderpriority: r.n_orders for r in rows} == dict(want_n)
    for r in rows:
        assert abs(r.believed_revenue - want_rev[r.o_orderpriority]) < 1e-4


def _python_bpe(words: Counter, iters: int = 3):
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(iters):
        pc = Counter()
        for w, syms in vocab.items():
            f = words[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((f"{a} {b}", c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    final_vocab = {s for syms in vocab.values() for s in syms}
    return merges, len(final_vocab)


def test_bpe_train_matches_reference_trainer(spark):
    rows = REGISTRY["text_bpe_train_merges"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    words = Counter(
        w
        for d in docs
        if d.text.strip()
        for w in d.text.lower().split()
        if w
    )
    merges, vocab_n = _python_bpe(words)
    assert [(r.merged_pair, r.pair_count) for r in rows] == merges
    assert all(r.vocab_size_after == vocab_n for r in rows)
    assert [r.step for r in rows] == [1, 2, 3]


def test_rate_limit_matches_python(spark):
    rows = REGISTRY["events_rate_limit_violations"].fn(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_user = defaultdict(list)
    for e in ev:
        ts = e.ts
        if isinstance(ts, int):
            ts = dt.datetime.fromtimestamp(ts / 1e9, dt.timezone.utc).replace(
                tzinfo=None
            )
        by_user[e.user_id].append(ts)
    want = {}
    for u, tss in by_user.items():
        tss.sort()
        viol = []
        for i, cur in enumerate(tss):
            cnt = sum(
                1 for x in tss if dt.timedelta(0) <= cur - x <= dt.timedelta(hours=1)
            )
            if cnt > 2:
                viol.append((cur, cnt))
        if viol:
            want[u] = (
                len(viol),
                max(c for _, c in viol),
                min(t for t, _ in viol),
            )
    assert {r.user_id for r in rows} == set(want)
    for r in rows:
        n, peak, first = want[r.user_id]
        assert (r.n_violations, r.peak_rate) == (n, peak)
        assert r.first_violation == first.strftime("%Y-%m-%d %H:%M:%S")
