"""Invariants for wave 109 (timezone parity, Welch's t-test)."""

from __future__ import annotations

import math

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_timezone_suite_offsets_and_dst(spark):
    rows = REGISTRY["scalar_timezone_suite"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 1000
    for r in rows:
        # January data: NY is EST (UTC-5); Kolkata fixed +5:30; Chatham
        # is NZDT+0:45 (+13:45) in southern summer.
        assert r.ny_off_min == -300
        assert r.chatham_off_min == 825
        assert r.kolkata_roundtrip_ok is True
        # DST-shifted column must take BOTH offsets across the corpus.
    offs = {r.shifted_ny_off_min for r in rows}
    assert offs == {-300, -240}, offs
    # day-boundary shifts exist (NY is behind UTC, so early-UTC rows flip)
    assert any(r.day_shift_ny for r in rows)
    assert not all(r.day_shift_ny for r in rows)


def test_timezone_suite_spring_forward_gap(spark):
    # Rows whose shifted timestamp lands in the 2024-03-10 02:xx NY gap
    # must have been pushed to 03:xx by the -240 offset (no 02:xx exists).
    rows = REGISTRY["scalar_timezone_suite"].fn(spark, SF_SMOKE).collect()
    bad = [
        r
        for r in rows
        if r.shifted_ny_s.startswith("2024-03-10 02:")
    ]
    assert bad == []


def test_welch_ttest_statistic_matches_numpy(spark):
    import numpy as np

    row = REGISTRY["agg_welch_ttest"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    x1 = np.array(
        [o.o_totalprice for o in orders if o.o_orderpriority == "1-URGENT"]
    )
    x2 = np.array(
        [o.o_totalprice for o in orders if o.o_orderpriority == "5-LOW"]
    )
    assert row.n1 == len(x1) and row.n2 == len(x2)
    v1, v2 = x1.var(ddof=1), x2.var(ddof=1)
    se1, se2 = v1 / len(x1), v2 / len(x2)
    t = (x1.mean() - x2.mean()) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (
        se1**2 / (len(x1) - 1) + se2**2 / (len(x2) - 1)
    )
    assert abs(row.t_stat - t) < 1e-9
    assert abs(row.df_welch - df) < 1e-6
    assert min(len(x1), len(x2)) - 1 <= row.df_welch <= len(x1) + len(x2) - 2
