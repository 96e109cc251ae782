"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row count, column names, and (order-insensitively)
values.

Usage:
    python tools/check_correctness.py [query ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, stringify values, sort rows — mirrors an
    order-insensitive value compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        return str(v)

    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.queries or list(qs)

    from copenhagen_traffic_and_weather_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="check-correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        if name not in qs:
            print(f"[{name}] MISSING from queries()")
            failures += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] SPARK ERROR: {e}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"[{name}] rows={len(srows)} ({spark_s:.1f}s) no-oracle (rows-only check)")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] ORACLE ERROR: {e}")
            failures += 1
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rows: spark={len(srows)} duck={len(drows)}")
        if ok:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            if ns != nd:
                ok = False
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                msgs.append(f"values differ; first diffs: {diff}")
        status = "OK " if ok else "FAIL"
        print(f"[{name}] {status} rows={len(srows)} ({spark_s:.1f}s)"
              + ("" if ok else " | " + " | ".join(msgs)))
        failures += 0 if ok else 1

    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
