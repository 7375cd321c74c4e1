"""Audit: expensive derived-column predicates pushed below a Repartition.

Constraint inference (isnotnull / size>0 on join keys and generator
inputs) substitutes aliases with their FULL defining expressions and
pushes the result through deterministic Projects and Repartitions.
When the alias is an expensive pipeline (md5 shingles, regex splits),
the pushed filter re-evaluates it BELOW the exchange that exists to
parallelize it — usually inside a single-task scan stage
(one-row-group parquet). Flag every bench query whose optimized plan
shows a Filter containing heavyweight expressions strictly below a
Repartition node.

Usage: python tools/pushdown_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_ingestion_data_pipeline_spark import get_spark
from news_ingestion_data_pipeline_spark.plans import REGISTRY

HEAVY = re.compile(
    r"md5\(|sha2\(|transform\(|aggregate\(|regexp_|split\(|sequence\(|"
    r"zip_with\(|conv\(|array_distinct\("
)


def audit_plan(plan: str) -> list[str]:
    """Return flagged Filter lines sitting below a Repartition."""
    hits = []
    lines = plan.splitlines()
    repart_depth: int | None = None
    for ln in lines:
        stripped = ln.lstrip(" :+-")
        depth = len(ln) - len(stripped)
        if repart_depth is not None and depth <= repart_depth:
            repart_depth = None
        if stripped.startswith(("Repartition", "RepartitionByExpression")):
            repart_depth = depth
            continue
        if (
            repart_depth is not None
            and depth > repart_depth
            and stripped.startswith("Filter")
            and HEAVY.search(stripped)
        ):
            hits.append(stripped[:200])
    return hits


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or sorted(REGISTRY)
    spark = get_spark("pushdown_audit")
    flagged = 0
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {type(e).__name__}: {e}", flush=True)
            continue
        hits = audit_plan(plan)
        if hits:
            flagged += 1
            print(f"FLAG  {name}", flush=True)
            for h in hits[:3]:
                print(f"      {h}", flush=True)
    print(f"done: {flagged} flagged of {len(names)}", flush=True)


if __name__ == "__main__":
    main()
