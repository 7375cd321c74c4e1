"""Invariants for wave 104 (period-to-date, interval suite, RAKE)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_period_to_date_resets(spark):
    rows = REGISTRY["window_period_to_date"].fn(spark, SF_SMOKE).collect()
    prev = None
    for r in rows:
        d = dt.date.fromisoformat(r.day)
        if prev is not None:
            pd_ = dt.date.fromisoformat(prev.day)
            if (d.year, d.month) == (pd_.year, pd_.month):
                assert abs(r.mtd_revenue - (prev.mtd_revenue + r.revenue)) < 1e-4
            else:
                assert abs(r.mtd_revenue - r.revenue) < 1e-9  # month reset
            if d.year == pd_.year:
                assert abs(r.ytd_revenue - (prev.ytd_revenue + r.revenue)) < 1e-4
            else:
                assert abs(r.ytd_revenue - r.revenue) < 1e-9  # year reset
        prev = r


def test_interval_suite_clamping_and_week(spark):
    rows = REGISTRY["scalar_interval_suite"].fn(spark, SF_SMOKE).collect()
    orders = {
        o.o_orderkey: o.o_orderdate
        for o in spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    }
    for r in rows[:500]:
        d = orders[r.o_orderkey]
        d = d.date() if isinstance(d, dt.datetime) else d
        # month-add clamps to end of target month
        y, m = (d.year + (d.month // 12), d.month % 12 + 1)
        import calendar

        want = dt.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))
        assert r.plus_1m == want.isoformat()
        assert r.month_end == d.replace(
            day=calendar.monthrange(d.year, d.month)[1]
        ).isoformat()
        assert r.weekday_mon0 == d.weekday()
        assert r.iso_week == d.isocalendar()[1]
        assert r.doy == d.timetuple().tm_yday


def test_rake_top_phrase_is_stopword_free(spark):
    rows = REGISTRY["text_rake_keywords"].fn(spark, SF_SMOKE).collect()
    docs = {
        d.doc_id: d.text
        for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    stop = {"the", "a", "of", "and", "to", "in"}
    for r in rows:
        words = r.top_phrase.split(" ")
        assert all(w not in stop for w in words)
        # the phrase occurs contiguously (stopword-bounded) in the doc
        toks = docs[r.doc_id].lower().split()
        joined = " ".join(toks)
        assert r.top_phrase in joined
        assert r.rake_score > 0
