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
    "curation_pack_sequences": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
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
