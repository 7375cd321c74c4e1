"""Invariants for wave 99 (merge-on-read deletes, column diff, streaks)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from news_ingestion_data_pipeline_spark.scratch import scratch_root


def test_merge_on_read_deletes_exact_victims(spark):
    rows = REGISTRY["storage_merge_on_read_deletes"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    victims = [d for d in docs if d.doc_id % 7 == 3]
    survivors = defaultdict(lambda: [0, 0])
    for d in docs:
        if d.doc_id % 7 != 3:
            survivors[d.lang][0] += 1
            survivors[d.lang][1] += d.doc_id
    assert {r.lang: (r.n_rows, r.sum_ids) for r in rows} == {
        k: tuple(v) for k, v in survivors.items()
    }
    for r in rows:
        assert r.n_deleted == len(victims)
    # base files untouched: re-reading base yields ALL rows
    import hashlib

    sfx = hashlib.md5(SF_SMOKE.encode()).hexdigest()[:8]
    base = f"{scratch_root('llm99')}/mor_base_{sfx}"
    assert spark.read.parquet(base).count() == len(docs)


def test_column_diff_counts(spark):
    rows = {
        r.col: r
        for r in REGISTRY["pipeline_column_level_diff"].fn(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    common = [d for d in docs if d.doc_id % 17 != 5]
    assert rows["lang"].n_changed == sum(1 for d in common if d.doc_id % 11 == 0)
    assert rows["n_chars"].n_changed == sum(
        1 for d in common if d.doc_id % 13 == 0
    )
    assert rows["source"].n_changed == 0
    for r in rows.values():
        assert r.n_common_rows == len(common)
        assert r.n_removed_rows == len(docs) - len(common)
        assert r.n_added_rows == 0


def test_longest_streak_brute_force(spark):
    rows = {r.user_id: r for r in REGISTRY["window_longest_streak"].fn(spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((e.ts, e.event_id, e.event_type))
    assert set(rows) == set(by_user)
    for u, seq in by_user.items():
        seq.sort()
        runs = defaultdict(int)  # (len, type) best
        best = []
        cur_t, cur_n = None, 0
        for _, _, et in seq:
            if et == cur_t:
                cur_n += 1
            else:
                if cur_t is not None:
                    best.append((cur_n, cur_t))
                cur_t, cur_n = et, 1
        best.append((cur_n, cur_t))
        want_len = max(n for n, _ in best)
        want_type = min(t for n, t in best if n == want_len)
        r = rows[u]
        assert (r.streak_len, r.streak_type, r.n_events) == (
            want_len,
            want_type,
            len(seq),
        )
