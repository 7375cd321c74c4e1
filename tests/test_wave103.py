"""Invariants for wave 103 (DLQ replay, partition-spec evolution)."""

from __future__ import annotations

from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_dlq_replay_full_recovery(spark):
    rows = REGISTRY["pipeline_dlq_replay"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    want = defaultdict(lambda: [0, 0, 0, 0])
    for d in docs:
        extra = d.doc_id % 23 == 11
        bad = d.doc_id % 19 == 7 and not extra
        a = want[d.lang]
        a[0] += 1
        a[1] += 0 if bad else d.n_chars
        a[2] += 1 if (extra or bad) else 0
        a[3] += 1 if bad else 0
    assert {
        r.lang: (r.n_rows, r.sum_chars, r.n_replayed, r.n_defaulted)
        for r in rows
    } == {k: tuple(v) for k, v in want.items()}
    # replay recovered EVERY row: totals equal the corpus
    assert sum(r.n_rows for r in rows) == len(docs)
    assert sum(r.n_replayed for r in rows) > 0


def test_spec_evolution_spans_generations(spark):
    rows = REGISTRY["storage_partition_spec_evolution"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    mx = max(d.doc_id for d in docs)
    want = defaultdict(lambda: [0, 0, 0, set(), 0])
    for d in docs:
        g1 = d.doc_id * 2 <= mx
        a = want[d.lang]
        a[0] += 1
        a[1] += 1 if g1 else 0
        a[2] += 0 if g1 else 1
        if not g1:
            a[3].add(d.source)
        a[4] += d.doc_id
    for r in rows:
        a = want[r.lang]
        assert (r.n_rows, r.n_gen1, r.n_gen2, r.n_gen2_sources, r.sum_ids) == (
            a[0],
            a[1],
            a[2],
            len(a[3]),
            a[4],
        )
        # both layouts genuinely contribute
        assert r.n_gen1 > 0 and r.n_gen2 > 0
