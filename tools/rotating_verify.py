"""Per-round rotating strict-verification record.

The driver's CORRECTNESS_r{N}.json samples the SAME 50 queries every
round (~9% of the registry). This tool draws a ROUND-SEEDED random 50
from the registry names NOT in that fixed set, runs them through the
strict oracle compare (mini_verify with MV_STRICT semantics), and
writes a committed ``VERIFY_r{N}.json`` artifact — over successive
rounds the records accumulate third-party-checkable strict coverage of
the whole registry, with the seed recorded so any judge can re-draw
the identical sample.

Usage: python tools/rotating_verify.py ROUND [sf_dir] [sample_size]
       (e.g. python tools/rotating_verify.py 10)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import mini_verify as MV  # noqa: E402
from news_ingestion_data_pipeline_spark import get_spark  # noqa: E402
from news_ingestion_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from news_ingestion_data_pipeline_spark.tables import TABLE_NAMES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_fixed_set(round_no: int) -> set[str]:
    """The driver's fixed CORRECTNESS sample = the union of keys of all
    recorded CORRECTNESS_r*.json (identical 50 every round so far; the
    union keeps this correct if the driver ever rotates too)."""
    fixed: set[str] = set()
    for n in range(1, round_no + 1):
        path = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if os.path.exists(path):
            fixed.update(json.load(open(path)))
    return fixed


def main() -> int:
    # strictness passed to mini_verify explicitly at run time — setting
    # MV_STRICT at import time silently flipped mini_verify to strict for
    # any later import in the same process (r10 ADVICE: import-order-
    # dependent pollution, surfaced via tests importing this module)
    MV.STRICT = True
    round_no = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    fixed = driver_fixed_set(round_no)
    pool = sorted(set(REGISTRY) - fixed)
    seed = round_no
    names = sorted(random.Random(seed).sample(pool, min(size, len(pool))))

    spark = get_spark("rotating_verify")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    results: dict[str, dict] = {}
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            results[name] = {"status": "FAIL", "error": f"spark: {e}"}
            n_fail += 1
            print(f"FAIL  {name}: spark error: {e}")
            continue
        sec = round(time.time() - t0, 2)
        if q.oracle is None:
            results[name] = {
                "status": "rows-only", "rows": len(srows), "sec": sec,
            }
            n_rowsonly += 1
            print(f"rows  {name}: {len(srows)} rows ({sec}s)")
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            tbl = res.fetch_arrow_table()
            _cols = [
                tbl.column(i).to_pylist() for i in range(tbl.num_columns)
            ]
            orows = list(zip(*_cols)) if _cols else []
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "FAIL", "error": f"oracle: {e}"}
            n_fail += 1
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        sn, sc, sh = MV.frame_hash(scols, [tuple(r) for r in srows])
        on, oc, oh = MV.frame_hash(ocols, orows)
        ok = (sn, sc, sh) == (on, oc, oh)
        results[name] = {
            "status": "PASS" if ok else "FAIL",
            "rows": sn,
            "sec": sec,
            "rows_match": sn == on,
            "schema_match": sc == oc,
            "hash_match": sh == oh,
        }
        if ok:
            n_pass += 1
            print(f"PASS  {name}: {sn} rows ({sec}s)")
        else:
            n_fail += 1
            print(
                f"FAIL  {name}: rows {sn}/{on} cols_eq={sc == oc} "
                f"hash_eq={sh == oh}"
            )
    artifact = {
        "round": round_no,
        "seed": seed,
        "sf_dir": sf_dir,
        "mode": "strict",
        "sample": "round-seeded random over REGISTRY minus the driver's "
        "fixed CORRECTNESS set",
        "pool_size": len(pool),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_rows_only": n_rowsonly,
        "queries": results,
    }
    out = os.path.join(REPO, f"VERIFY_r{round_no:02d}.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only of "
        f"{len(names)} -> {out}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
