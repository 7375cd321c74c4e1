"""Solo-query timer: bench.py methodology for ONE query (or a list).

Usage: python tools/qtime.py NAME [NAME ...] [--repeats N] [--explain DIR]

Per query: clearCache, warmup run at sf0.001, then N timed noop-sink runs
at $SPARK_GRAFT_SF_DIR (default sf0.1); prints each run and the min, plus
the per-query steal delta so a throttled run is self-identifying. With
--explain DIR, writes DIR/<name>.txt with the .explain("formatted") plan
at the target SF (captured outside the timed window).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_ingestion_data_pipeline_spark import get_spark
from news_ingestion_data_pipeline_spark.plans import REGISTRY, artifact_cache

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    explain_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1])
            i += 2
        elif args[i] == "--explain":
            explain_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qtime")
    REGISTRY["q1_pricing_summary"].fn(spark, WARMUP_SF_DIR).count()

    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        REGISTRY[name].fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        artifact_cache.drain()
        runs = []
        warm = False
        s0 = _steal()
        for _ in range(repeats):
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            warm = warm or any(k == "hit" for _, k in artifact_cache.drain())
        steal = (_steal() - s0) / 100
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = REGISTRY[name].fn(spark, sf_dir)
            txt = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(txt)
        print(
            f"{name}: min={min(runs):.3f}s runs=["
            + ", ".join(f"{r:.2f}" for r in runs)
            + f"] steal={steal:.1f}s"
            + (" [warm-artifacts]" if warm else "")
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
