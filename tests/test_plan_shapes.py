"""Plan-shape FREEZE tests for the headline bench queries.

Answers can stay green while the physical plan silently regresses (the
round-5 agg_kmv_intersection episode: a partition-less WindowExec crept
in, correct answers, 2-task sort). These tests snapshot the executed-
plan invariants that make each query scale-correct — the presence of
the operator the plan was designed around (TakeOrderedAndProject,
WindowGroupLimit, pushed filters, pruned columns) and the absence of
the known 100x-killers (CartesianProduct, unadjudicated
BroadcastNestedLoopJoin, partition-less Window over SF-proportional
frames). Deliberately breaking a frozen invariant must fail here even
when the answers still verify.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"

#: name -> (must-contain substrings, must-NOT-contain substrings).
#: Invariants are chosen to be SF-robust: operator choices forced by the
#: plan's construction (limits, window group limits, pushdown-able
#: predicates, column pruning), not size-dependent join strategies.
FROZEN: dict[str, tuple[list[str], list[str]]] = {
    # TPC-H heads: predicate pushdown reaches the parquet scan, column
    # pruning drops the wide comment column, no cross products.
    "q1_pricing_summary": (
        ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"],
        ["CartesianProduct", "l_comment"],
    ),
    "q3_shipping_priority": (
        ["TakeOrderedAndProject", "PushedFilters: [IsNotNull(c_mktsegment)"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q6_forecast_revenue": (
        ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"],
        ["CartesianProduct", "l_returnflag", "l_comment"],
    ),
    "q9_profit_by_nation": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q13_customer_distribution": (
        ["LeftOuter"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q18_large_volume_customers": (
        ["TakeOrderedAndProject(limit=100"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q10_returned_items": (
        ["TakeOrderedAndProject", "PushedFilters: [IsNotNull(l_returnflag)"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # Global top-N must compile to TakeOrderedAndProject — never a
    # global sort + limit.
    "pipeline_topn_latest": (
        ["TakeOrderedAndProject(limit=10"],
        ["CartesianProduct"],
    ),
    # The round-5 regression, frozen for good: per-type k-smallest via
    # TakeOrderedAndProject; the 2-task partition-less Window must never
    # return. (The BroadcastNestedLoopJoin Cross here is adjudicated:
    # it cross-joins 32-row KMV sketches, aggregate-scale by
    # construction.)
    "agg_kmv_intersection": (
        ["TakeOrderedAndProject(limit=32"],
        ["CartesianProduct", " Window "],
    ),
    # Top-k-per-group: rank pushes into WindowGroupLimit (partial+final)
    # and the window stays PARTITIONED — no single-partition funnel of
    # an SF-proportional frame.
    "window_topk_per_group": (
        ["WindowGroupLimit"],
        ["CartesianProduct", "Exchange SinglePartition"],
    ),
    "sim_lsh_topk": (
        ["WindowGroupLimit"],
        ["CartesianProduct"],
    ),
    # Candidate generators must stay equi-join shaped: banded/bucketed
    # keys, never a cross product or nested-loop fallback.
    "dedup_minhash_candidates": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "dedup_ngram_jaccard": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "dedup_simhash_hamming": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "dedup_embedding_neardup": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "dedup_embedding_neardup_banded": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # Keep-first-per-fingerprint: the rank filter pushes into a
    # PARTITIONED WindowGroupLimit (partial + final around the
    # fingerprint shuffle) — no global funnel.
    "dedup_exact_rows": (
        ["WindowGroupLimit"],
        [
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "Exchange SinglePartition",
        ],
    ),
    "join_asof": (
        [],
        ["CartesianProduct"],
    ),
    "events_funnel_conversion": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # r8: the cumsum now rides distributed_prefix_sum, whose 1-row
    # min/max envelope joins in as a broadcast scalar crossJoin (the
    # adjudicated BroadcastNestedLoopJoin class) — only the true
    # cartesian stays banned.
    "curation_pack_sequences": (
        [],
        ["CartesianProduct"],
    ),
    # r8 rewrites: global heads must compile to TakeOrderedAndProject
    # (never sort-all + limit), pinning the decomposed shapes.
    "profile_join_key_skew": (
        ["TakeOrderedAndProject(limit=10"],
        ["CartesianProduct"],
    ),
    "text_vocab_coverage": (
        ["TakeOrderedAndProject(limit=1000"],
        ["CartesianProduct"],
    ),
    "agg_ks_two_sample": (
        ["TakeOrderedAndProject(limit=1"],
        ["CartesianProduct"],
    ),
    "agg_approx_top_k": (
        ["TakeOrderedAndProject(limit=10"],
        ["CartesianProduct"],
    ),
    "text_bpe_merge_step": (
        ["TakeOrderedAndProject(limit=10"],
        ["CartesianProduct"],
    ),
    "influence_self_memorization": (
        ["TakeOrderedAndProject(limit=20"],
        ["CartesianProduct"],
    ),
}


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def _check(plan: str, must: list[str], must_not: list[str]) -> list[str]:
    """Violated invariants in ``plan`` (empty = frozen shape holds)."""
    problems = [f"missing: {m!r}" for m in must if m not in plan]
    problems += [f"present: {m!r}" for m in must_not if m in plan]
    return problems


@pytest.mark.parametrize("name", sorted(FROZEN))
def test_frozen_plan_shape(spark, name):
    must, must_not = FROZEN[name]
    plan = _plan(spark, name)
    problems = _check(plan, must, must_not)
    assert not problems, f"{name} plan shape regressed: {problems}\n{plan}"


def test_checker_catches_deliberate_break():
    """The freeze actually bites: a plan with a cross product (or one
    that lost its TakeOrderedAndProject) is flagged."""
    good = "TakeOrderedAndProject(limit=10)\n+- FileScan parquet"
    bad_cross = good + "\n+- CartesianProduct"
    bad_lost = "Sort\n+- Exchange SinglePartition\n+- FileScan parquet"
    must, must_not = ["TakeOrderedAndProject"], ["CartesianProduct"]
    assert _check(good, must, must_not) == []
    assert _check(bad_cross, must, must_not) == ["present: 'CartesianProduct'"]
    assert _check(bad_lost, must, must_not) == [
        "missing: 'TakeOrderedAndProject'"
    ]


# ---------------------------------------------------------------------------
# Registry-wide global-window ban (round-8 invariant)
# ---------------------------------------------------------------------------
#
# A partition-less Window over an SF-proportional frame funnels the whole
# frame through ONE task — the round-7 verdict's only scale finding. The
# checker walks every registered query's OPTIMIZED logical plan and counts
# partition-less Window nodes, auto-adjudicating only the shapes that are
# bounded BY CONSTRUCTION:
#   * the two-pass ranking helpers' bucket-histogram windows (order by a
#     `__rnk_b` bucket key — at most the fixed bucket count of rows);
#   * windows above a Limit (global top-K already reduced the frame);
#   * windows whose subtree reads no table at all (literal grids).
# Every OTHER global window must carry an entry below with its bounded-
# domain justification. New queries default to ZERO — adding a global
# window without adjudicating it here fails the suite.

#: global-window-ok: query -> (allowed_count, bounded-domain reason)
GLOBAL_WINDOW_OK: dict[str, tuple[int, str]] = {
    "agg_bh_fdr_correction": (2, "p-value rank over the event_type domain (5 values)"),
    "agg_energy_distance": (1, "offsets over its own ~300-row value-range bucket histogram"),
    "agg_hdr_latency_percentiles": (4, "deliberate exact-rank audit baseline beside the mergeable histogram (r7 verdict adjudication: 'the part you drop at 100 TB')"),
    "agg_ljung_box": (1, "autocorrelation over the fixed lag grid"),
    "agg_median_of_means": (2, "median over the FIXED bucket-mean count k"),
    "agg_rolling_origin_cv": (1, "folds over the day-granular time axis"),
    "agg_runs_test": (1, "lag over the day-granular daily-count series"),
    "agg_spc_individuals_chart": (1, "moving range over the day-granular series"),
    "agg_theil_sen_trend": (2, "pairwise slopes over the day-pair domain (~days^2/2, calendar-bounded)"),
    "curation_epoch_apportionment": (1, "largest-remainder rank over the SOURCE domain"),
    "customer_survival_km": (2, "suffix-sum + KM product over the day-granular gap/event axes"),
    "events_autocorrelation": (1, "ACF over the fixed lag grid"),
    "events_bradley_terry": (8, "final rank + 7 unrolled copies of the per-MM-round normalization sum, ALL over the 5-row event-type rating frame (r11: the normalization window replaced a per-round aggregate+broadcast pair and the per-round localCheckpoints were dropped — 62 jobs -> 25; the un-truncated 3-round lineage references round t-1 twice, so the round-t window appears 2^(3-t) times: 1+2+4=7 copies, each executing over <= 5 rows)"),
    "events_bootstrap_ci": (1, "rank over the FIXED bootstrap replicate count B"),
    "events_changepoint_binseg": (1, "prefix sums over the day-granular series"),
    "events_seasonal_decompose": (2, "seasonal index over the hour/day-of-week grid"),
    "feature_gini_best_split": (2, "split scan over the fixed feature-bucket grid"),
    "orders_mom_growth": (1, "lag over the month domain"),
    "part_skyline_2d": (1, "prefix min over the p_size domain (1..50)"),
    "pipeline_refetch_schedule": (1, "schedule rank over the stream domain (5 event types)"),
    "window_rolling_corr": (1, "rolling window over the hour-granular series"),
}


def _walk_jvm(node):
    yield node
    cs = node.children()
    for i in range(cs.length()):
        yield from _walk_jvm(cs.apply(i))


_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation$", "Range", "LocalLimit"}


def count_unadjudicated_global_windows(df) -> list[str]:
    """Order-spec strings of partition-less Windows in the optimized
    plan that are NOT bounded by construction (see module comment)."""
    out = []
    for n in _walk_jvm(df._jdf.queryExecution().optimizedPlan()):
        if n.getClass().getSimpleName() != "Window":
            continue
        if not n.partitionSpec().isEmpty():
            continue
        spec = n.orderSpec().toString()
        if "__rnk_b" in spec:
            continue  # ranking-helper bucket histogram (fixed bucket count)
        bounded = False
        unbounded_leaf = False
        for c in _walk_jvm(n):
            cls = c.getClass().getSimpleName()
            if cls in ("GlobalLimit", "LocalLimit"):
                bounded = True
                break
            if c.children().isEmpty() and cls not in _BOUNDED_LEAVES:
                unbounded_leaf = True
        if bounded or not unbounded_leaf:
            continue
        out.append(spec[:120])
    return out


_ALL_NAMES = sorted(REGISTRY)
_N_CHUNKS = 24


@pytest.mark.parametrize("chunk", range(_N_CHUNKS))
def test_registry_global_window_ban(spark, chunk):
    names = _ALL_NAMES[chunk::_N_CHUNKS]
    problems = []
    for name in names:
        try:
            from tests.conftest import build_query_df

            df = build_query_df(spark, name, SF)
        except Exception as e:  # construction failures surface elsewhere
            problems.append(f"{name}: construction failed: {e!r:.200}")
            continue
        wins = count_unadjudicated_global_windows(df)
        allowed, _reason = GLOBAL_WINDOW_OK.get(name, (0, ""))
        if len(wins) > allowed:
            problems.append(
                f"{name}: {len(wins)} unadjudicated global window(s) "
                f"(allowed {allowed}): {wins}"
            )
        elif len(wins) < allowed:
            problems.append(
                f"{name}: adjudication stale — found {len(wins)} global "
                f"windows but GLOBAL_WINDOW_OK allows {allowed}; tighten it"
            )
    assert not problems, "\n".join(problems)


def test_global_window_checker_catches_a_real_one(spark):
    """The detector actually bites: a naked row_number over a parquet
    scan is flagged; the same rank through distributed_row_number is
    clean."""
    from pyspark.sql import Window as W

    from news_ingestion_data_pipeline_spark.operators.ranking import (
        distributed_row_number,
    )
    from news_ingestion_data_pipeline_spark.tables import load_table

    df = load_table(spark, SF, "part").select("p_partkey", "p_size")
    naked = df.withColumn(
        "rn", F.row_number().over(W.orderBy("p_size", "p_partkey"))
    )
    assert count_unadjudicated_global_windows(naked)
    clean = distributed_row_number(
        df, ["p_size", "p_partkey"], F.col("p_size") % 16
    )
    assert not count_unadjudicated_global_windows(clean)
    # a window above a global top-K is bounded by construction
    topped = df.orderBy("p_size", "p_partkey").limit(5).withColumn(
        "rn", F.row_number().over(W.orderBy("p_size", "p_partkey"))
    )
    assert not count_unadjudicated_global_windows(topped)
