"""Invariants for wave 100 (CSV corrupt records, IVF nprobe sweep)."""

from __future__ import annotations

from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_csv_corrupt_partition(spark):
    rows = REGISTRY["scan_csv_corrupt_records"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    extra = [d for d in docs if d.doc_id % 23 == 11]
    bad = [d for d in docs if d.doc_id % 19 == 7 and d.doc_id % 23 != 11]
    clean = defaultdict(lambda: [0, 0])
    for d in docs:
        if d.doc_id % 23 != 11 and not (d.doc_id % 19 == 7):
            clean[d.lang][0] += 1
            clean[d.lang][1] += d.n_chars
    assert {r.lang: (r.n_rows, r.sum_chars) for r in rows} == {
        k: tuple(v) for k, v in clean.items()
    }
    for r in rows:
        assert r.n_extra_col == len(extra)
        assert r.n_bad_int == len(bad)
        assert r.n_corrupt == len(extra) + len(bad)
    # every document is either clean or quarantined, never both/neither
    assert sum(r.n_rows for r in rows) + rows[0].n_corrupt == len(docs)


def test_nprobe_sweep_monotone_and_bounded(spark):
    rows = sorted(
        REGISTRY["sim_ivf_nprobe_sweep"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in rows] == [1, 2, 4]
    recalls = [r.recall_at_5 for r in rows]
    # recall is monotone non-decreasing in probe budget and in (0, 1]
    assert recalls == sorted(recalls)
    for r in rows:
        assert 0.0 <= r.recall_at_5 <= 1.0
        assert r.n_hits == round(r.recall_at_5 * 50)
        assert r.n_queries == 10
    # probing 4/16 cells should already find a decent share
    assert recalls[-1] >= 0.5
