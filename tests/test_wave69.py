"""Invariants for wave 69 (McNemar, ABC x XYZ grid)."""

from __future__ import annotations

from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_mcnemar_matches_python(spark):
    [r] = REGISTRY["agg_mcnemar_paired"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    c1, c2, users = set(), set(), set()
    for e in ev:
        users.add(e.user_id)
        if e.event_type == "purchase":
            (c1 if e.ts.day <= 15 else c2).add(e.user_id)
    both = len(c1 & c2)
    of = len(c1 - c2)
    os_ = len(c2 - c1)
    neither = len(users - c1 - c2)
    assert (r.both, r.only_first, r.only_second, r.neither) == (both, of, os_, neither)
    assert r.both + r.only_first + r.only_second + r.neither == len(users)
    if of + os_ > 0:
        chi2 = (abs(of - os_) - 1) ** 2 / (of + os_)
        assert abs(r.mcnemar_chi2_cc - chi2) < 1e-6
        assert abs(r.p_second_given_discordant - os_ / (of + os_)) < 1e-6
    else:
        assert r.mcnemar_chi2_cc is None


def test_abc_xyz_grid_consistent_with_parts(spark):
    rows = REGISTRY["orders_abc_xyz_grid"].fn(spark, SF_SMOKE).collect()
    abc = REGISTRY["lineitem_abc_classification"].fn(spark, SF_SMOKE).collect()
    # the ABC side is scoped to l_partkey % 17 = 0 (its registered output
    # contract); the grid partitions the INTERSECTION of that set with the
    # >=6-demand-months XYZ-eligible parts
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_shipdate").collect()
    months = defaultdict(set)
    for x in li:
        months[x.l_partkey].add(x.l_shipdate.strftime("%Y-%m"))
    abc_parts = {r.l_partkey for r in abc}
    eligible = {p for p, m in months.items() if len(m) >= 6} & abc_parts
    assert sum(r.n_parts for r in rows) == len(eligible)
    assert abs(sum(r.revenue_share for r in rows)) <= 1.0 + 1e-6
    classes = {(r.abc_class, r.xyz_class) for r in rows}
    assert len(classes) == len(rows)  # no duplicate cells
    abc_classes = {r.abc_class for r in abc}
    for r in rows:
        assert r.abc_class in abc_classes
        assert r.xyz_class in {"X", "Y", "Z"}
        assert r.n_parts >= 1
        assert 0.0 <= r.revenue_share <= 1.0
