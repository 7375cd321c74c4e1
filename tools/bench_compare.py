"""Compare two bench artifacts on their common queries.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]

Prints the common-query total ratio (new/old), per-query ratios for the
largest drifts both ways, and each artifact's steal/repeats context so
the reader knows which numbers are min-of-N versus single-pass.

Mode discipline: min-of-N minimums are effectively warm-cache numbers
(OS page cache + JIT stay hot across the N passes), so a min-of-3 total
compared against a single-pass baseline carries a built-in tailwind.
This tool therefore refuses to print an aggregate ratio across modes
unless --cross-mode is passed, and even then stamps the output so the
number can't be quoted as a clean round-over-round ratio.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--cross-mode"]
    allow_cross = "--cross-mode" in sys.argv[1:]
    old_path, new_path = args[0], args[1]
    top_n = int(args[2]) if len(args) > 2 else 12
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    ot = sum(oq[q] for q in common)
    nt = sum(nq[q] for q in common)
    o_rep = old.get("repeats", 1)
    n_rep = new.get("repeats", 1)
    print(
        f"old: {old_path} n={len(oq)} steal={old.get('cpu_steal_sec')}s "
        f"repeats={o_rep}"
    )
    print(
        f"new: {new_path} n={len(nq)} steal={new.get('cpu_steal_sec')}s "
        f"repeats={n_rep}"
    )
    # min-of-3 vs min-of-5 carries the same warm/min bias the guard
    # exists to flag — only IDENTICAL repeat counts are mode-matched
    # (r10 ADVICE)
    mode_matched = o_rep == n_rep
    if common and ot > 0:
        ratio = f"ratio {nt / ot:.3f}"
        if not mode_matched:
            if not allow_cross:
                ratio = (
                    "ratio REFUSED: min-of-N vs single-pass is not "
                    "mode-matched (pass --cross-mode to force)"
                )
            else:
                ratio = (
                    f"ratio {nt / ot:.3f} [CROSS-MODE: min-of-N vs "
                    f"single-pass — warm-bias tailwind, not a clean "
                    f"round-over-round number]"
                )
        print(f"common {len(common)} queries: old {ot:.1f}s -> new {nt:.1f}s {ratio}")
    else:
        print(
            f"common {len(common)} queries: old {ot:.1f}s -> new {nt:.1f}s "
            f"(no ratio: empty common set or zero old total)"
        )
    drifts = sorted(
        ((nq[q] - oq[q], nq[q] / oq[q] if oq[q] else float("inf"), q)
         for q in common),
        reverse=True,
    )
    print("\nlargest regressions (abs sec):")
    for d, r, q in drifts[:top_n]:
        print(f"  {q:38s} {oq[q]:7.2f}s -> {nq[q]:7.2f}s  ({r:4.2f}x)")
    print("\nlargest improvements (abs sec):")
    for d, r, q in drifts[-top_n:][::-1]:
        print(f"  {q:38s} {oq[q]:7.2f}s -> {nq[q]:7.2f}s  ({r:4.2f}x)")


if __name__ == "__main__":
    main()
