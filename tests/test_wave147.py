"""Invariants for wave 147 (macro-F1, runs test)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_macro_f1_consistent_with_confusion(spark):
    rows = REGISTRY["text_langid_macro_f1"].fn(spark, SF_SMOKE).collect()
    conf = REGISTRY["curation_langid_confusion"].fn(spark, SF_SMOKE).collect()
    tp = defaultdict(int)
    fp = defaultdict(int)
    fn = defaultdict(int)
    for c in conf:
        if c.actual_lang == c.pred_lang:
            tp[c.actual_lang] += c.n_docs
        else:
            fn[c.actual_lang] += c.n_docs
            fp[c.pred_lang] += c.n_docs
    f1s = []
    for r in rows:
        assert (r.tp, r.fn) == (tp[r.lang], fn[r.lang])
        assert r.fp == fp[r.lang]
        f1 = round(2 * r.tp / max(2 * r.tp + r.fp + r.fn, 1), 9)
        assert abs(r.f1 - f1) < 1e-9
        assert 0 <= r.precision_ <= 1 and 0 <= r.recall_ <= 1
        f1s.append(f1)
    macro = {round(r.macro_f1, 9) for r in rows}
    assert len(macro) == 1
    assert abs(rows[0].macro_f1 - sum(f1s) / len(f1s)) < 1e-9


def test_runs_test_matches_python(spark):
    row = REGISTRY["agg_runs_test"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    from datetime import date

    counts = Counter()
    for o in orders:
        d = date(o.o_orderdate.year, o.o_orderdate.month, o.o_orderdate.day)
        counts[(d - date(1970, 1, 1)).days] += 1
    xs = [x for _, x in sorted(counts.items())]
    sx = sorted(xs)
    m = (
        sx[len(sx) // 2]
        if len(sx) % 2
        else (sx[len(sx) // 2 - 1] + sx[len(sx) // 2]) / 2
    )
    signs = [1 if x > m else 0 for x in xs]
    runs = 1 + sum(1 for p, c in zip(signs, signs[1:]) if p != c)
    a, b = sum(signs), len(signs) - sum(signs)
    assert (row.n_runs, row.n_above, row.n_below) == (runs, a, b)
    mu = 2 * a * b / (a + b) + 1
    var = 2 * a * b * (2 * a * b - a - b) / ((a + b) ** 2 * (a + b - 1))
    assert abs(row.mu_runs - mu) < 1e-9
    assert abs(row.runs_z - (runs - mu) / math.sqrt(var)) < 1e-9
