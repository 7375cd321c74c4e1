"""Invariants for wave 124 (Holt-Winters weekly, multiline CSV)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _hw_py(xs, a=0.2, b=0.1, g=0.3):
    l = xs[0][0]
    bb = 0.0
    s = [0.0] * 7
    for x, dow in xs:
        dow = int(dow)
        l_new = a * (x - s[dow]) + (1 - a) * (l + bb)
        bb = b * (l_new - l) + (1 - b) * bb
        s[dow] = g * (x - l_new) + (1 - g) * s[dow]
        l = l_new
    return l, bb, s


def test_holt_winters_matches_python(spark):
    rows = sorted(
        REGISTRY["orders_holt_winters_weekly"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.dow,
    )
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("day")
    ).collect()
    days = [o.day for o in orders]
    d0, d1 = min(days), max(days)
    counts = Counter(days)
    xs = [(float(counts.get(d, 0)), float(d % 7)) for d in range(d0, d1 + 1)]
    l, bb, s = _hw_py(xs)
    assert len(rows) == 7
    for r in rows:
        assert r.n_days == d1 - d0 + 1
        assert abs(r.level - round(l, 6)) < 1e-6
        assert abs(r.trend - round(bb, 6)) < 1e-6
        assert abs(r.seasonal - round(s[r.dow], 6)) < 1e-6
        h = (r.dow - (d1 + 1) % 7 + 7) % 7 + 1
        assert abs(r.forecast_next - round(l + h * bb + s[r.dow], 6)) < 1e-5


def test_multiline_csv_counts(spark):
    rows = REGISTRY["scan_csv_multiline"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    by_lang = Counter(d.lang for d in docs)
    nls = Counter()
    for d in docs:
        nls[d.lang] += d.text.count(" ")
    assert {r.lang: r.n_rows for r in rows} == dict(by_lang)
    assert {r.lang: r.n_newlines for r in rows} == dict(nls)
    assert all(len(r.content_md5) == 32 for r in rows)
