"""Physical-plan audit across the whole query registry.

For every registered query, builds the DataFrame at the given SF dir and
inspects ``explain("formatted")`` output for the plan properties that
matter at 100 TB:

  exch   — number of Exchange operators (shuffles; ReusedExchange excluded)
  sort   — number of Sort operators
  bnlj   — BroadcastNestedLoopJoin / CartesianProduct present (the O(n·m)
           shapes; expected ONLY where a query is deliberately cross)
  py     — Python evaluation in the plan (ArrowEval/BatchEval/
           mapInPandas/applyInPandas; expected ONLY in the declared
           Python-boundary operators)
  scancols — columns read by the widest parquet scan (column pruning check)

Streaming queries (stream_*) are skipped: their registry fns execute a
real streaming run and return the drained sink, so there is no unexecuted
plan to audit. Iterative ops (connected components) execute driver-side
loops while building — they run, slower, and report their FINAL plan.

Usage: python tools/plan_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_ingestion_data_pipeline_spark import get_spark
from news_ingestion_data_pipeline_spark.plans import REGISTRY

PY_MARKERS = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "FlatMapGroupsInPandasWithState",
)


def audit_one(spark, name: str, sf_dir: str) -> dict:
    df = REGISTRY[name].fn(spark, sf_dir)
    s = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    exch = len(re.findall(r"^\s*(?:\+-|:-|\||\s)*\s*Exchange\b", s, re.M))
    reused = s.count("ReusedExchange")
    sorts = len(re.findall(r"\bSort\b", s.split("\n\n")[0]))
    bnlj = ("BroadcastNestedLoopJoin" in s) or ("CartesianProduct" in s)
    py = any(m in s for m in PY_MARKERS)
    scan_widths = [
        len(m.group(1).split(","))
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", s)
        if m.group(1)
    ]
    return {
        "exch": exch,
        "reused": reused,
        "sort": sorts,
        "bnlj": bnlj,
        "py": py,
        "maxscan": max(scan_widths, default=0),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)] or sorted(REGISTRY)
    spark = get_spark()
    print(f"{'query':34s} exch reuse sort bnlj py maxscan")
    flagged = []
    for name in names:
        if name.startswith("stream_"):
            continue
        try:
            r = audit_one(spark, name, sf_dir)
        except Exception as ex:  # noqa: BLE001 — audit must visit every query
            print(f"{name:34s} ERROR {str(ex).splitlines()[0][:60]}")
            flagged.append((name, "error"))
            continue
        mark = ""
        if r["bnlj"] and "cross" not in name and "grid" not in name:
            mark += " <-- BNLJ"
            flagged.append((name, "bnlj"))
        if r["py"] and not name.startswith(
            ("multimodal_", "text_zscore", "sim_gemm", "sql_udtf")
        ):
            mark += " <-- PYTHON"
            flagged.append((name, "python"))
        print(
            f"{name:34s} {r['exch']:4d} {r['reused']:5d} {r['sort']:4d} "
            f"{str(r['bnlj'])[0]:>4s} {str(r['py'])[0]:>2s} {r['maxscan']:7d}{mark}"
        )
    print(f"\n{len(flagged)} flagged: {flagged if flagged else 'none'}")


if __name__ == "__main__":
    main()
