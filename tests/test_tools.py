"""Tooling-layer tests: bench/scale-smoke enrollment sanity and the
bench_compare mode-matching contract (round-10's pinned convention)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_bench_and_smoke_lists_resolve_in_registry():
    """Every name in bench.py's BENCH_QUERIES and scale_smoke's two
    lists must exist in REGISTRY — a typo here silently drops a query
    from the standing measurement lists."""
    from news_ingestion_data_pipeline_spark.plans import REGISTRY

    import bench
    import scale_smoke

    for src, names in (
        ("bench.BENCH_QUERIES", bench.BENCH_QUERIES),
        ("scale_smoke.QUERIES", scale_smoke.QUERIES),
        ("scale_smoke.DOC_QUERIES", scale_smoke.DOC_QUERIES),
    ):
        missing = [n for n in names if n not in REGISTRY]
        assert not missing, f"{src}: not in REGISTRY: {missing}"


def _artifact(tmp_path, name: str, repeats: int, queries: dict) -> str:
    p = tmp_path / name
    p.write_text(
        json.dumps(
            {"repeats": repeats, "cpu_steal_sec": 0.0, "queries": queries}
        )
    )
    return str(p)


def _compare(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_compare.py"),
         *args],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_bench_compare_refuses_cross_mode(tmp_path):
    """A min-of-N artifact compared against a single-pass one must NOT
    print an aggregate ratio (warm-bias tailwind) unless --cross-mode
    is passed, and then only with the stamp."""
    old = _artifact(tmp_path, "old.json", 3, {"q1": 1.0, "q2": 2.0})
    new = _artifact(tmp_path, "new.json", 1, {"q1": 1.5, "q2": 2.5})
    out = _compare(old, new)
    assert "ratio REFUSED" in out and "1.333" not in out
    out2 = _compare(old, new, "--cross-mode")
    assert "CROSS-MODE" in out2 and "1.333" in out2


def test_bench_compare_mode_matched_ratio(tmp_path):
    old = _artifact(tmp_path, "old.json", 3, {"q1": 1.0, "q2": 2.0})
    new = _artifact(tmp_path, "new.json", 3, {"q1": 1.5, "q2": 2.5})
    out = _compare(old, new)
    assert "ratio 1.333" in out


def test_bench_compare_guards_empty_common_set(tmp_path):
    """Disjoint query sets (or a zero old total) must report instead of
    crashing with ZeroDivisionError (round-9 ADVICE #4)."""
    old = _artifact(tmp_path, "old.json", 1, {"a": 1.0})
    new = _artifact(tmp_path, "new.json", 1, {"b": 2.0})
    out = _compare(old, new)
    assert "no ratio" in out


def test_rotating_verify_pool_excludes_driver_fixed_set():
    """The rotating sample must be disjoint from the driver's fixed
    CORRECTNESS queries — that disjointness is the artifact's whole
    point."""
    import rotating_verify as RV
    from news_ingestion_data_pipeline_spark.plans import REGISTRY

    fixed = RV.driver_fixed_set(10)
    assert fixed, "no CORRECTNESS_r*.json found"
    pool = set(REGISTRY) - fixed
    assert not (pool & fixed)
    # the committed artifact's sample must re-draw identically
    art = json.load(open(os.path.join(REPO, "VERIFY_r10.json")))
    import random

    redraw = sorted(
        random.Random(art["seed"]).sample(
            sorted(pool), min(50, len(pool))
        )
    )
    assert redraw == sorted(art["queries"]), (
        "VERIFY_r10.json sample no longer re-drawable (registry changed "
        "after the artifact was recorded — re-run tools/rotating_verify.py)"
    )
