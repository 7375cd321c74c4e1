"""Per-process scratch roots for fixture-writing plans.

Plans that materialize fixtures (Delta/Iceberg layouts, ORC/CSV/JSONL
exports, streaming checkpoints) need a writable scratch directory. A
FIXED ``/tmp`` path keyed only by the sf_dir hash lets two concurrent
processes running the same query clobber each other mid-write (the
round-5 repro: concurrent pytest + mini_verify produced
``FileNotFoundError`` inside a half-deleted fixture). Keying the root
by pid isolates processes; plans still ``rmtree`` at entry, so re-runs
within a process stay deterministic and stale dirs from a recycled pid
are rebuilt, not trusted.
"""

from __future__ import annotations

import os


def scratch_root(tag: str) -> str:
    """``/tmp/spark_graft_<tag>_p<pid>`` — unique per process, stable
    within it (so a plan called twice in one run reuses its cache
    semantics exactly as before)."""
    return f"/tmp/spark_graft_{tag}_p{os.getpid()}"
