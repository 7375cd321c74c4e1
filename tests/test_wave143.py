"""Invariants for wave 143 (circular hour stats, decile migration)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_circular_stats_match_python(spark):
    rows = REGISTRY["events_circular_hour_stats"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type",
        F.expr(
            "CAST(unix_micros(cast(ts as timestamp)) % 86400000000 AS BIGINT)"
            " div 3600000000"
        ).alias("hour"),
    ).collect()
    hours = defaultdict(Counter)
    for e in ev:
        hours[e.event_type][e.hour] += 1
    for r in rows:
        counts = hours[r.event_type]
        n = sum(counts.values())
        sc = sum(c * round(math.cos(2 * math.pi * h / 24), 9) for h, c in counts.items())
        ss = sum(c * round(math.sin(2 * math.pi * h / 24), 9) for h, c in counts.items())
        assert r.n == n
        assert abs(r.resultant_length - round(math.hypot(sc, ss) / n, 6)) < 1e-6
        mh = (math.atan2(ss, sc) * 24 / (2 * math.pi) + 24) % 24
        assert abs(r.mean_hour - round(mh, 6)) < 1e-6
        assert 0 <= r.resultant_length <= 1
        assert 0 <= r.mean_hour < 24


def test_decile_migration_marginals(spark):
    rows = REGISTRY["customer_decile_migration"].fn(spark, SF_SMOKE).collect()
    total = sum(r.n_customers for r in rows)
    from_marginal = Counter()
    to_marginal = Counter()
    for r in rows:
        assert 1 <= r.dec_early <= 10 and 1 <= r.dec_late <= 10
        from_marginal[r.dec_early] += r.n_customers
        to_marginal[r.dec_late] += r.n_customers
    # NTILE marginals differ by at most 1 between deciles
    for marg in (from_marginal, to_marginal):
        sizes = [marg.get(d, 0) for d in range(1, 11)]
        assert max(sizes) - min(sizes) <= 1
        assert sum(sizes) == total
