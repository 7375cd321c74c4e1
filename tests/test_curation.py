"""Semantic invariants for the corpus-curation operators — properties the
hash-parity oracle can't express (coverage, determinism across runs,
contamination-freedom), checked against the sf0.001 fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF_SMOKE)


def test_chunks_reconstruct_prefix_tokens(spark):
    """Every chunk's tokens must be the doc's normalized tokens at the
    expected offsets — i.e. chunking loses nothing and invents nothing."""
    from news_ingestion_data_pipeline_spark.functions import text as TX

    docs = {
        r.doc_id: r.tk
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", TX.tokens(TX.normalize_text(F.col("text"))).alias("tk"))
        .collect()
    }
    chunks = _run(spark, "curation_chunk_windows").collect()
    seen_docs = set()
    for c in chunks:
        tk = docs[c.doc_id]
        start = c.chunk_idx * 24  # stride
        expect = tk[start : start + 32]
        assert c.chunk_text.split(" ") == expect if expect else c.chunk_text == ""
        assert c.n_chunk_tokens == len(expect)
        seen_docs.add(c.doc_id)
    assert seen_docs == set(docs)  # every doc chunked, even short ones


def test_chunk_overlap_covers_all_tokens(spark):
    """Union of [start, start+32) windows covers 0..len-1 for each doc."""
    rows = (
        _run(spark, "curation_chunk_windows")
        .groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_idx") * 24 + F.col("n_chunk_tokens")).alias("covered"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .collect()
    )
    from news_ingestion_data_pipeline_spark.functions import text as TX

    lens = {
        r.doc_id: r.n
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(TX.tokens(TX.normalize_text(F.col("text")))).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.covered == lens[r.doc_id]


def test_decontaminated_docs_share_no_benchmark_grams(spark):
    """Brute-force recheck: no surviving doc shares a word-3gram with the
    benchmark slice (python-side set arithmetic as the model)."""
    texts = {
        r.doc_id: r.s
        for r in load_table(spark, SF_SMOKE, "documents")
        .select(
            "doc_id",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.lower("text"), r"[^a-z0-9\s]", " "), r"\s+", " "
                )
            ).alias("s"),
        )
        .collect()
    }

    def grams(s):
        tk = s.split(" ") if s else []
        return {" ".join(tk[i : i + 3]) for i in range(max(len(tk) - 2, 0))}

    bench = set()
    for did, s in texts.items():
        if did % 41 == 0:
            bench |= grams(s)
    survivors = {r.doc_id for r in _run(spark, "curation_decontaminate").collect()}
    for did, s in texts.items():
        if did % 41 == 0:
            assert did not in survivors  # benchmark rows never in train output
        elif did in survivors:
            assert not (grams(s) & bench), f"doc {did} is contaminated"
        else:
            assert grams(s) & bench, f"doc {did} dropped but clean"


def test_stratified_sample_determinism_and_rates(spark):
    a = {r.doc_id for r in _run(spark, "curation_sample_stratified").collect()}
    b = {r.doc_id for r in _run(spark, "curation_sample_stratified").collect()}
    assert a == b  # hash-derived: identical across runs, no RNG state
    docs = load_table(spark, SF_SMOKE, "documents")
    n_en = docs.filter(F.col("lang") == "en").count()
    kept_en = (
        _run(spark, "curation_sample_stratified").filter(F.col("lang") == "en").count()
    )
    # md5 buckets are uniform-ish; 80% target with generous slack at n≈200
    assert 0.6 * n_en <= kept_en <= 0.95 * n_en


def test_k_per_group_exact_counts(spark):
    rows = _run(spark, "curation_sample_k_per_group").collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.rn)
    docs = load_table(spark, SF_SMOKE, "documents")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, rns in per_lang.items():
        k = min(20, totals[lang])
        assert sorted(rns) == list(range(1, k + 1))


def test_pii_redaction_removes_all_matches(spark):
    import re

    out = {r.doc_id: r for r in _run(spark, "curation_pii_redact").collect()}
    texts = {
        r.doc_id: r.text for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    pat = re.compile(r"[0-9]{4,}|customer|supplier")
    hits = 0
    for did, txt in texts.items():
        low = txt.lower()
        matches = pat.findall(low)
        assert out[did].n_redactions == len(matches)
        red = pat.sub("[REDACTED]", low)
        assert out[did].redacted_len == len(red)
        hits += len(matches)
    assert hits > 0  # the corpus actually exercises the redaction path


def test_quality_filter_flags_consistent(spark):
    rows = _run(spark, "curation_quality_filter").collect()
    assert any(not r.passed for r in rows) and any(r.passed for r in rows)
    for r in rows:
        assert r.passed == (
            r.ok_length and r.ok_word_len and r.ok_stopwords
            and r.ok_punct and r.ok_repetition
        )


def test_dedup_corpus_keeps_exactly_cluster_canonicals(spark):
    clusters = {
        r.doc_id: r.cluster_id
        for r in REGISTRY["dedup_connected_clusters"].fn(spark, SF_SMOKE).collect()
    }
    survivors = {r.doc_id for r in _run(spark, "curation_dedup_corpus").collect()}
    all_ids = {
        r.doc_id for r in load_table(spark, SF_SMOKE, "documents").select("doc_id").collect()
    }
    expect = {d for d in all_ids if d not in clusters or clusters[d] == d}
    assert survivors == expect
    assert len(survivors) < len(all_ids)  # the fixture does contain near-dups


def test_gaps_islands_matches_python_model(spark):
    events = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
        )
        .collect()
    )
    by_user = {}
    for r in events:
        by_user.setdefault(r.user_id, []).append((r.us, r.event_id))
    expect = {}
    for uid, rows in by_user.items():
        rows.sort()
        sessions = []
        prev = None
        for us, _eid in rows:
            if prev is None or us - prev > 600_000_000:
                sessions.append(0)
            sessions[-1] += 1
            prev = us
        expect[uid] = (len(sessions), max(sessions), sum(sessions))
    got = {
        r.user_id: (r.n_sessions, r.max_session_events, r.n_events_total)
        for r in _run(spark, "events_gaps_islands").collect()
    }
    assert got == expect
