"""Compare two testdata roots table-by-table (SCALING.md rule 6).

Built for the moment the driver's /root/testdata returns after the
round-6 wipe: the in-repo replica (gen_local_testdata.py) must stay
faithful to the driver data for replica-derived perf/divergence results
to transfer. Usage:

    python tools/diff_testdata.py /root/testdata/sf0.01 \
        /root/repo/.localdata/sf0.01

Per table it reports: schema (column names + Arrow dtypes, ordered),
row count, null count per column, and a numeric value-domain summary
(min/max plus exact-decimal grid check for money columns). Everything
reads parquet footers/column stats via pyarrow — no Spark session, so
it runs in seconds even at sf0.1.

Exit code 0 = schemas identical and row counts within --rowtol
(default 2x) per table; 1 otherwise. Value-domain differences are
informational (replicas share shape, not values).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import pyarrow.parquet as pq

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# 2-dp money columns: the rational-tie rounding rules (SCALING.md rule 1)
# assume these sit exactly on a cent grid; flag any drift off it.
MONEY = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice", "l_discount", "l_tax"],
}


def table_profile(path: Path):
    f = pq.ParquetFile(path)
    schema = [(n, str(f.schema_arrow.field(n).type)) for n in f.schema_arrow.names]
    rows = f.metadata.num_rows
    stats = {}
    for rg in range(f.metadata.num_row_groups):
        g = f.metadata.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            s = col.statistics
            if s is None:
                continue
            lo, hi, nulls = s.min, s.max, s.null_count or 0
            if name in stats:
                plo, phi, pn = stats[name]
                try:
                    lo = min(lo, plo) if lo is not None and plo is not None else plo
                    hi = max(hi, phi) if hi is not None and phi is not None else phi
                except TypeError:
                    lo, hi = plo, phi
                nulls += pn
            stats[name] = (lo, hi, nulls)
    return schema, rows, stats


def money_grid_ok(path: Path, cols: list[str]) -> dict[str, bool]:
    t = pq.read_table(path, columns=cols)
    out = {}
    for c in cols:
        vals = t.column(c).to_pylist()
        out[c] = all(
            v is None or abs(v * 100 - round(v * 100)) < 1e-6 for v in vals
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("left")
    ap.add_argument("right")
    ap.add_argument("--rowtol", type=float, default=2.0,
                    help="max allowed row-count ratio per table")
    args = ap.parse_args()
    left, right = Path(args.left), Path(args.right)
    bad = False
    for t in TABLES:
        lp, rp = left / f"{t}.parquet", right / f"{t}.parquet"
        if not lp.exists() or not rp.exists():
            print(f"[{t}] MISSING: left={lp.exists()} right={rp.exists()}")
            bad = True
            continue
        ls, lr, lstat = table_profile(lp)
        rs, rr, rstat = table_profile(rp)
        if ls != rs:
            lcols, rcols = dict(ls), dict(rs)
            only_l = sorted(set(lcols) - set(rcols))
            only_r = sorted(set(rcols) - set(lcols))
            dtype = sorted(
                c for c in set(lcols) & set(rcols) if lcols[c] != rcols[c]
            )
            print(f"[{t}] SCHEMA DIFF: only-left={only_l} only-right={only_r} "
                  f"dtype={[(c, lcols[c], rcols[c]) for c in dtype]}")
            bad = True
        ratio = max(lr, rr) / max(1, min(lr, rr))
        flag = "" if ratio <= args.rowtol else "  << ROW-COUNT DIVERGES"
        if ratio > args.rowtol:
            bad = True
        print(f"[{t}] rows {lr} vs {rr} (x{ratio:.2f}){flag}")
        for c in sorted(set(lstat) & set(rstat)):
            (llo, lhi, ln), (rlo, rhi, rn) = lstat[c], rstat[c]
            if ln != rn or llo != rlo or lhi != rhi:
                print(f"    {c}: range/nulls differ "
                      f"L=({llo!r}..{lhi!r}, nulls={ln}) "
                      f"R=({rlo!r}..{rhi!r}, nulls={rn})")
        for side, p in (("left", lp), ("right", rp)):
            cols = MONEY.get(t)
            if cols:
                for c, ok in money_grid_ok(p, cols).items():
                    if not ok:
                        print(f"    {c} ({side}): OFF the 2-dp cent grid — "
                              "SCALING.md rule 1 assumptions do not hold")
                        bad = True
    print("RESULT:", "DIVERGENT" if bad else "COMPATIBLE")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
