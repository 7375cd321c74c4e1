"""Per-stage profile for one query: where does its wall time go?

Usage: python tools/qprof.py NAME [NAME...]

Runs the query once at sf0.001 (warmup — codegen/planning paid outside
the profiled run), then once at $SPARK_GRAFT_SF_DIR with the UI enabled,
and prints the run's jobs/stages from the monitoring REST API: stage
durations, task counts, shuffle bytes — plus the wall-time breakdown
(sum of stage times vs wall = scheduler/driver/planning overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_ingestion_data_pipeline_spark import get_spark
from news_ingestion_data_pipeline_spark.plans import REGISTRY

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qprof", extra_conf={"spark.ui.enabled": "true"})
    app_id = spark.sparkContext.applicationId
    REGISTRY["q1_pricing_summary"].fn(spark, WARMUP_SF_DIR).count()

    for name in names:
        spark.catalog.clearCache()
        REGISTRY[name].fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs")}
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        t_build = time.time() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0

        jobs = [
            j
            for j in _api(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = {
            s["stageId"]: s
            for s in _api(f"applications/{app_id}/stages?status=complete")
        }
        print(f"\n=== {name}: wall={wall:.3f}s build={t_build:.3f}s "
              f"jobs={len(jobs)} stages={len(stage_ids)}")
        stage_sum = 0.0
        for j in jobs:
            print(f"  job {j['jobId']} [{j.get('name','')[:60]}] "
                  f"stages={sorted(j['stageIds'])}")
        for sid in stage_ids:
            s = stages.get(sid)
            if not s:
                continue
            d = (s.get("executorRunTime", 0)) / 1000.0
            first = s.get("firstTaskLaunchedTime")
            dur_wall = None
            if first and s.get("completionTime"):
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    a = time.strptime(first[:23], "%Y-%m-%dT%H:%M:%S.%f")
                    b = time.strptime(s["completionTime"][:23],
                                      "%Y-%m-%dT%H:%M:%S.%f")
                    dur_wall = time.mktime(b) - time.mktime(a)
                except ValueError:
                    pass
            stage_sum += dur_wall or 0
            print(
                f"  stage {sid}: tasks={s['numCompleteTasks']} "
                f"wall={dur_wall if dur_wall is not None else '?'}s "
                f"runTime={d:.2f}s "
                f"in={s.get('inputBytes',0)>>10}K "
                f"sh_r={s.get('shuffleReadBytes',0)>>10}K "
                f"sh_w={s.get('shuffleWriteBytes',0)>>10}K "
                f"[{s.get('name','')[:50]}]"
            )
        print(f"  stage-wall-sum={stage_sum:.2f}s vs wall={wall:.2f}s "
              f"(gap = driver/planning/scheduling)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
