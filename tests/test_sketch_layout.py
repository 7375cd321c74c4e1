"""Invariant tests for the sketch / layout / linkage / corpus waves
(llm23-llm26): properties that must hold by construction, checked on the
real fixtures (value-level equivalence vs DuckDB lives in mini_verify)."""

from __future__ import annotations

import math

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE

SF_01 = "/root/testdata/sf0.01"


def _run(spark, name, sf=SF_SMOKE):
    return REGISTRY[name].fn(spark, sf).collect()


def test_kmv_estimate_within_sketch_error_bound(spark):
    [row] = _run(spark, "agg_kmv_distinct")
    assert row.exact_distinct > 0
    # KMV standard error is ~1/sqrt(k-2) with k=64 -> 12.7%; allow 4 sigma.
    assert row.rel_error <= 4 / math.sqrt(62)
    assert row.kmv_estimate > 0


def test_countmin_never_undercounts(spark):
    rows = _run(spark, "agg_countmin_heavy_hitters")
    assert len(rows) == 10
    for r in rows:
        assert r.cms_estimate >= r.exact_cnt, r
        assert r.overcount == r.cms_estimate - r.exact_cnt


def test_zorder_files_tighter_than_rowseq(spark):
    rows = {r.layout: r for r in _run(spark, "storage_zorder_layout")}
    assert set(rows) == {"zorder", "rowseq"}
    # The whole point of the layout: z-order bounding boxes cover a far
    # smaller fraction of the key plane than arrival-order files.
    assert rows["zorder"].avg_area_frac < rows["rowseq"].avg_area_frac / 2
    assert rows["zorder"].n_files == rows["rowseq"].n_files


def test_record_linkage_blocked_pairs_are_ordered_and_close(spark):
    rows = _run(spark, "join_record_linkage")
    for r in rows:
        assert r.name_a < r.name_b
        assert 0 < r.edit_dist <= 3
        assert r.name_a[0] == r.name_b[0]  # blocking key respected
        assert abs(len(r.name_a) - len(r.name_b)) <= r.edit_dist


def test_span_dedup_conserves_spans_and_drops_repeats(spark):
    rows = _run(spark, "curation_span_dedup")
    docs = REGISTRY["curation_span_dedup"].fn  # noqa: F841  (self-doc)
    total_docs = len(rows)
    assert total_docs == 500  # one row per document at sf0.001
    assert all(r.kept_spans >= 1 or r.dropped_spans >= 1 for r in rows)
    assert any(r.dropped_spans > 0 for r in rows)  # corpus has repeats
    for r in rows:
        assert (r.new_text_md5 == "") == (r.kept_spans == 0)


def test_clustering_coeff_bounds(spark):
    rows = _run(spark, "graph_clustering_coeff", SF_01)
    assert rows, "co-presence graph at sf0.01 should have deg>=2 nodes"
    for r in rows:
        assert 0.0 <= r.clustering_coeff <= 1.0
        assert r.triangles <= r.degree * (r.degree - 1) // 2


def test_cluster_purity_partition_covers_all_vectors(spark):
    rows = _run(spark, "sim_cluster_purity")
    assert sum(r.n_assigned for r in rows) == 500  # every vector assigned
    for r in rows:
        assert 0.0 < r.cluster_purity <= 1.0
        assert r.n_majority <= r.n_assigned


def test_autocorrelation_is_a_valid_correlation(spark):
    rows = _run(spark, "events_autocorrelation")
    assert [r.lag for r in rows] == [1, 2, 3, 6, 12, 24]
    for r in rows:
        assert -1.0 <= r.acf <= 1.0
        assert r.n_pairs > 0


def test_kcore_every_survivor_meets_threshold(spark):
    rows = _run(spark, "graph_kcore_peel", SF_01)
    assert rows, "sf0.01 co-presence graph has a nonempty 2-core"
    for r in rows:
        # defining property of the k-core fixpoint: every surviving
        # node keeps degree >= k within the surviving subgraph
        assert r.core_degree >= 2


def test_cume_percent_monotone_within_flag(spark):
    rows = _run(spark, "window_cume_percent")
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r)
    for flag_rows in by_flag.values():
        qs = [r.quantity for r in flag_rows]
        assert qs == sorted(qs)
        cds = [r.cume_dist for r in flag_rows]
        assert cds == sorted(cds)
        assert abs(cds[-1] - 1.0) < 1e-9
        assert flag_rows[0].pct_rank == 0.0


def test_dbscan_roles_partition_the_corpus(spark):
    rows = _run(spark, "sim_dbscan")
    assert len(rows) == 500 and len({r.vec_id for r in rows}) == 500
    for r in rows:
        if r.role == "noise":
            assert r.cluster is None
        else:
            assert r.cluster is not None
    # a border point's cluster label must belong to some core point
    core_clusters = {r.cluster for r in rows if r.role == "core"}
    for r in rows:
        if r.role == "border":
            assert r.cluster in core_clusters


def test_growth_accounting_identity(spark):
    rows = _run(spark, "orders_growth_accounting")
    assert rows
    for r in rows:
        # exact identity — revenue is integer cents end to end
        assert abs(
            (r.new_rev + r.resurrected_rev + r.expansion_rev
             + r.contraction_rev + r.churned_rev) - r.net_change
        ) < 1e-9
        assert r.new_rev >= 0 and r.resurrected_rev >= 0
        assert r.expansion_rev >= 0
        assert r.contraction_rev <= 0 and r.churned_rev <= 0


def test_wilson_bounds_bracket_the_rate(spark):
    rows = _run(spark, "events_rate_wilson")
    lowers = [r.wilson_lower for r in rows]
    assert lowers == sorted(lowers, reverse=True)  # ranked by lower bound
    for r in rows:
        assert 0.0 <= r.wilson_lower <= r.rate <= r.wilson_upper <= 1.0


def test_heaps_beta_in_sane_range(spark):
    [r] = _run(spark, "text_heaps_law")
    assert r.vocab_half <= r.vocab_full
    assert r.tokens_half < r.tokens_full
    assert 0.0 <= r.heaps_beta <= 1.0


def test_ohlc_open_close_within_low_high(spark):
    rows = _run(spark, "window_ohlc_resample")
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_samples >= 1


def test_point_in_polygon_is_a_strict_subset(spark):
    [r] = _run(spark, "join_point_in_polygon")
    assert 0 < r.n_inside < r.n_points
    assert r.inside_id_sum > 0


def test_attribution_credit_conserves_per_user_budget(spark):
    rows = _run(spark, "events_attribution_ushape")
    total_credit = sum(r.credit for r in rows)
    # every converting user with >=1 pre-purchase touch hands out
    # exactly 1.0 +- (n_touches * 1ppm integer rounding)
    from news_ingestion_data_pipeline_spark.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events")
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("c"))
    )
    n_users = (
        ev.join(conv, "user_id")
        .where(
            F.col("event_type").isin("view", "click", "signup")
            & (F.col("ts") < F.col("c"))
        )
        .select("user_id")
        .distinct()
        .count()
    )
    n_touches = sum(r.n_touches for r in rows)
    assert abs(total_credit - n_users) <= n_touches * 1e-6 + 1e-9


def test_price_index_is_100_at_base_month(spark):
    rows = _run(spark, "lineitem_price_index")
    assert rows
    base = min(rows, key=lambda r: r.month)
    assert abs(base.laspeyres_index - 100.0) < 1e-9


def test_km_survival_is_nonincreasing(spark):
    rows = _run(spark, "customer_survival_km")
    surv = [r.survival for r in sorted(rows, key=lambda r: r.t_days)]
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= s <= 1.0 for s in surv)


def test_quantile_normalize_maps_into_global_range(spark):
    rows = _run(spark, "curation_quantile_normalize")
    los = min(r.n_chars for r in rows)
    his = max(r.n_chars for r in rows)
    by_source: dict[str, list] = {}
    for r in rows:
        assert los <= r.norm_chars <= his
        by_source.setdefault(r.source, []).append(r)
    # monotone within source: bigger raw length never maps lower
    for rs in by_source.values():
        rs.sort(key=lambda r: (r.n_chars, r.doc_id))
        ns = [r.norm_chars for r in rs]
        assert all(a <= b + 1e-9 for a, b in zip(ns, ns[1:]))


def test_epoch_shuffle_orders_decorrelate(spark):
    rows = _run(spark, "curation_epoch_shuffle")
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append((r.pos, r.doc_id))
    assert set(by_epoch) == {1, 2, 3}
    heads = {}
    for ep, lst in by_epoch.items():
        lst.sort()
        ids = [d for _, d in lst]
        assert len(set(ids)) == len(ids) == 10
        heads[ep] = tuple(ids)
    assert heads[1] != heads[2] and heads[2] != heads[3]


def test_forecast_backtest_smape_bounds(spark):
    rows = _run(spark, "events_forecast_backtest")
    for r in rows:
        assert 0.0 <= r.smape_naive <= 2.0
        assert 0.0 <= r.smape_seasonal <= 2.0
        assert r.n_seasonal <= r.n_naive  # 24-lag has fewer valid pairs
