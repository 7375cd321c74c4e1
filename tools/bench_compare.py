"""Compare two bench artifacts on their common queries.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]

Prints the common-query total ratio (new/old), per-query ratios for the
largest drifts both ways, and each artifact's steal/repeats context so
the reader knows which numbers are min-of-N versus single-pass.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    ot = sum(oq[q] for q in common)
    nt = sum(nq[q] for q in common)
    print(
        f"old: {old_path} n={len(oq)} steal={old.get('cpu_steal_sec')}s "
        f"repeats={old.get('repeats', 1)}"
    )
    print(
        f"new: {new_path} n={len(nq)} steal={new.get('cpu_steal_sec')}s "
        f"repeats={new.get('repeats', 1)}"
    )
    print(
        f"common {len(common)} queries: old {ot:.1f}s -> new {nt:.1f}s "
        f"ratio {nt / ot:.3f}"
    )
    drifts = sorted(
        ((nq[q] - oq[q], nq[q] / oq[q] if oq[q] else float("inf"), q)
         for q in common),
        reverse=True,
    )
    print(f"\nlargest regressions (abs sec):")
    for d, r, q in drifts[:top_n]:
        print(f"  {q:38s} {oq[q]:7.2f}s -> {nq[q]:7.2f}s  ({r:4.2f}x)")
    print(f"\nlargest improvements (abs sec):")
    for d, r, q in drifts[-top_n:][::-1]:
        print(f"  {q:38s} {oq[q]:7.2f}s -> {nq[q]:7.2f}s  ({r:4.2f}x)")


if __name__ == "__main__":
    main()
