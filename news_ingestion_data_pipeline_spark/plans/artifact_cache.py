"""Hit/miss event log for the artifact-reuse caches.

The composition-query caches (ngram pair table, cluster assignment,
weighted-LSH candidates) make a consumer near-free when the producer
already ran in the same session — which mixes cold and warm numbers in
cross-round bench comparisons. Each cache helper records a hit/miss
event here; ``bench.py`` drains the log per timed query and writes a
``warm_artifacts`` attribution into ``BENCH_FULL.json`` so ratio
computations can separate cache wins from plan wins.
"""

from __future__ import annotations

#: (cache_name, "hit" | "miss") events since the last drain.
EVENTS: list[tuple[str, str]] = []


def record(cache: str, hit: bool) -> None:
    EVENTS.append((cache, "hit" if hit else "miss"))


def drain() -> list[tuple[str, str]]:
    out = list(EVENTS)
    EVENTS.clear()
    return out
