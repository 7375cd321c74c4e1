"""Invariants for wave 116 (personalized PageRank, language rebalance)."""

from __future__ import annotations

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_ppr_mass_conserved_and_seed_dominant(spark):
    rows = REGISTRY["graph_personalized_pagerank"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    total = sum(r.ppr for r in rows)
    # teleport + transition conserve unit mass (up to round-8)
    assert abs(total - 1.0) < 1e-6
    ranks = {r.node: r.ppr for r in rows}
    # the seed absorbs the teleport, so it can't be the minimum
    assert ranks["signup"] > min(ranks.values())
    assert all(p >= 0 for p in ranks.values())


def test_rebalance_everyone_hits_majority_count(spark):
    rows = REGISTRY["curation_language_rebalance"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    from collections import Counter

    counts = Counter(d.lang for d in docs)
    tgt = max(counts.values())
    by_lang = {r.lang: r for r in rows}
    assert set(by_lang) == set(counts)
    for lang, r in by_lang.items():
        assert r.n_orig == counts[lang]
        assert r.n_out == tgt
        assert r.quota_spread <= 1
        # checksum = sum over docs of doc_id * reps; verify analytically
        ids = sorted(d.doc_id for d in docs if d.lang == lang)
        base, extra = divmod(tgt, len(ids))
        expect = base * sum(ids) + sum(ids[:extra])
        assert r.docid_checksum == expect
