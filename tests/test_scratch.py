"""Per-process scratch roots (round-5 verdict #2): two concurrent
processes running the same fixture-writing plan must not share a
/tmp directory."""

import os

from news_ingestion_data_pipeline_spark.scratch import scratch_root


def test_scratch_root_is_pid_keyed():
    r = scratch_root("llm164")
    assert r == f"/tmp/spark_graft_llm164_p{os.getpid()}"


def test_scratch_root_stable_within_process():
    assert scratch_root("x") == scratch_root("x")
    assert scratch_root("x") != scratch_root("y")


def test_no_plan_module_uses_fixed_tmp_root():
    import glob
    import re

    pat = re.compile(r'=\s*"/tmp/')
    offenders = []
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "news_ingestion_data_pipeline_spark",
    )
    for p in glob.glob(os.path.join(base, "**", "*.py"), recursive=True):
        if p.endswith("scratch.py"):
            continue
        with open(p, encoding="utf-8") as fh:
            for i, line in enumerate(fh, 1):
                if pat.search(line) and "spark_graft" in line:
                    offenders.append(f"{p}:{i}")
    assert offenders == []
