"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every REGISTRY query on Spark and (when an oracle exists) the oracle
SQL on DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive value hash (values normalized:
floats rounded to 9 significant-ish decimals, timestamps → ISO strings).

Usage: python tools/mini_verify.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from news_ingestion_data_pipeline_spark import get_spark
from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import TABLE_NAMES


STRICT = os.environ.get("MV_STRICT", "") == "1"


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, decimal.Decimal):
        # The driver fetches DuckDB results through the pandas/Arrow path,
        # where HUGEINT/DECIMAL surface as float/Decimal — normalize through
        # the float branch so a Decimal-typed oracle column diverges from a
        # Spark BIGINT exactly like it does on the driver (r02's two red
        # rows). The hygiene suite bans such oracle output types outright.
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v) if STRICT else f"{v:.6g}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), ",".join(sorted_cols), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("mini_verify")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        spark_sec = time.time() - t0
        if q.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {spark_sec:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            # Arrow fetch, not fetchall(): mirrors the driver's rendering
            # (HUGEINT → decimal128 → Decimal, not Python int), so local
            # strict green predicts driver green.
            tbl = res.fetch_arrow_table()
            # positional extraction: to_pylist() dicts keyed by name would
            # silently collapse duplicate output column names to the last
            # value (false PASS/FAIL instead of an error)
            _cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            orows = list(zip(*_cols)) if _cols else []
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        sn, sc, sh = frame_hash(scols, [tuple(r) for r in srows])
        on, oc, oh = frame_hash(ocols, orows)
        if (sn, sc, sh) == (on, oc, oh):
            print(f"PASS  {name}: {sn} rows ({spark_sec:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}:")
            if sn != on:
                print(f"      rows spark={sn} oracle={on}")
            if sc != oc:
                print(f"      cols spark={sc} oracle={oc}")
            if sh != oh and sn == on and sc == oc:
                print("      value hash mismatch; sample diff:")
                sset = {
                    "|".join(norm_value(v) for v in r) for r in srows[:2000]
                }
                oset = {"|".join(norm_value(v) for v in r) for r in orows[:2000]}
                for x in list(sset - oset)[:3]:
                    print(f"        spark-only:  {x[:200]}")
                for x in list(oset - sset)[:3]:
                    print(f"        oracle-only: {x[:200]}")
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only "
        f"of {len(names)} queries"
    )
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
