"""Invariants for wave 110 (instruction dedup, perplexity filter)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_instruction_dedup_keeps_one_per_prompt(spark):
    rows = REGISTRY["curation_instruction_dedup"].fn(spark, SF_SMOKE).collect()
    keys = [r.prompt_key for r in rows]
    assert len(keys) == len(set(keys))
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r.n_variants for r in rows) == n_docs
    # every kept pair is the longest-response variant of its group
    assert all(r.best_resp_tokens >= 0 for r in rows)
    dupes = [r for r in rows if r.n_variants > 1]
    assert dupes, "fixture corpus contains near-duplicate prompts"


def test_perplexity_filter_matches_python_lm(spark):
    rows = {
        r.doc_id: r
        for r in REGISTRY["curation_perplexity_filter"].fn(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    from collections import Counter

    corpus = {d.doc_id: d.text.split() for d in docs}
    lm = Counter()
    for toks in corpus.values():
        lm.update(toks)
    n_total, vocab = sum(lm.values()), len(lm)
    nlp_e9 = {
        w: round(-math.log2((c + 1) / (n_total + vocab)) * 1e9)
        for w, c in lm.items()
    }
    for d in docs:
        toks = corpus[d.doc_id]
        r = rows[d.doc_id]
        assert r.n_tokens == len(toks)
        if not toks:
            assert r.xent_microbits is None and r.keep is False
            continue
        a = sum(nlp_e9[t] for t in toks)
        expect = (2 * a + len(toks) * 1000) // (2 * len(toks) * 1000)
        assert r.xent_microbits == expect
        assert r.keep == (expect <= 13_000_000)


def test_perplexity_filter_flags_tail(spark):
    df = REGISTRY["curation_perplexity_filter"].fn(spark, SF_SMOKE)
    agg = df.agg(
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert 0 < agg.kept <= agg.n
