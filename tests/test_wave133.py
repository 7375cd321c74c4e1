"""Invariants for wave 133 (interval union, business days)."""

from __future__ import annotations

from collections import defaultdict
from datetime import date, timedelta

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_interval_union_matches_python_sweep(spark):
    rows = {
        r.user_id: r
        for r in REGISTRY["events_interval_union"].fn(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").filter(
        F.col("event_type") == "error"
    ).select(
        "user_id", F.expr("unix_micros(cast(ts as timestamp))").alias("us")
    ).collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append((e.us, e.us + 300_000_000))
    for uid, ivs in per_user.items():
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        r = rows[uid]
        assert r.n_outages == len(merged)
        assert r.downtime_sec == sum(e - s for s, e in merged) // 1_000_000
        assert r.longest_sec == max(e - s for s, e in merged) // 1_000_000
        # merging can only reduce the naive (overlap-double-counting) sum
        assert r.downtime_sec <= len(ivs) * 300


def test_business_days_match_python_calendar(spark):
    rows = REGISTRY["scalar_business_days"].fn(spark, SF_SMOKE).limit(500).collect()
    epoch = date(1970, 1, 1)
    for r in rows:
        # recover the dates from the certified span is not possible alone;
        # recompute via a weekday walk using calendar_days + business_days
        # invariants instead:
        assert 0 <= r.business_days <= r.calendar_days
        # a span of full weeks has exactly 5/7 weekdays
        if r.calendar_days % 7 == 0:
            assert r.business_days == r.calendar_days // 7 * 5


def test_business_days_spot_check_against_datetime(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
        ).alias("d1"),
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("d0"),
    )
    from collections import Counter

    epoch = date(1970, 1, 1)
    expect = Counter()
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem,
    # so compare multisets keyed by the full output tuple
    for r in li.join(orders, li.l_orderkey == orders.o_orderkey).collect():
        bd = sum(
            1
            for k in range(1, max(r.d1 - r.d0, 0) + 1)
            if (epoch + timedelta(days=r.d0 + k)).weekday() < 5
        )
        expect[(r.l_orderkey, r.l_linenumber, max(r.d1 - r.d0, 0), bd)] += 1
    rows = REGISTRY["scalar_business_days"].fn(spark, SF_SMOKE).collect()
    got = Counter(
        (r.l_orderkey, r.l_linenumber, r.calendar_days, r.business_days)
        for r in rows
    )
    assert got == expect
