"""Core-count scaling sweep at a fixed SF (r16-verdict item #7).

sf0.1 is fixed-overhead-bound (the r16 8-core driver run was FASTER
than the 32-core one), so per-query core-scaling evidence needs a
meaningful size: this sweeps the costliest benched queries at sf1
(replica data) under local[32] vs local[8], one FRESH subprocess JVM
per (cpus) cell — same steady-state rationale as scaling_sweep.py —
and reports t(c8)/t(c32). Perfectly CPU-bound-and-parallel work would
read ~4.0 on a 4x core step; ~1.0 means cores do not help and the
query needs a named limiter (single-partition stage, Python worker
serialization, driver-side floor) or a fix.

Usage: python tools/cpu_scaling_sweep.py [--sf-dir .localdata/sf1] > CPU_SCALING_SF1.md
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Top benched queries by sf0.1 cost (round-17 opening bench), extended
# set first, plus the expensive headline dedups — the paths whose
# core-scaling actually matters.
QUERIES = [
    "triangle_count_coorder",
    "triangle_count_doulion",
    "dedup_prefix_filter_jaccard",
    "decontaminate_bloom",
    "pagerank_event_transitions",
    "record_linkage_score",
    "countmin_token_counts",
    "pmi_token_pairs",
    "bpe_pair_merges",
    "equidepth_histogram",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "heavy_hitters_tokens",
    "kmv_set_intersection",
    "bm25_retrieval",
]

_WORKER_SRC = """
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from copenhagen_traffic_and_weather_etl_pipeline_spark.session import get_spark
from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import REGISTRY
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
names = sys.argv[2:]
spark = get_spark(app_name="cpu_scaling_pass")
# Warm the JVM/session floor on the first query before timing anything.
REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
out = {}
for n in names:
    best = None
    for rep in range(2):
        spark.sparkContext.setJobDescription(f"cpu_scaling:{n}:rep{rep}")
        t0 = time.perf_counter()
        REGISTRY[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[n] = round(best, 3)
print(json.dumps(out))
"""


def _steal_pct(t0: tuple[int, int], t1: tuple[int, int]) -> float:
    ds, dt = t1[0] - t0[0], t1[1] - t0[1]
    return round(100.0 * ds / dt, 2) if dt else 0.0


def _read_stat() -> tuple[int, int]:
    parts = Path("/proc/stat").read_text().splitlines()[0].split()[1:]
    vals = [int(x) for x in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def run_cell(cpus: int, sf_dir: str) -> tuple[dict[str, float], float]:
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": str(cpus),
    }
    s0 = _read_stat()
    r = subprocess.run(
        [sys.executable, "-c", _WORKER_SRC, str(REPO), *QUERIES],
        capture_output=True,
        text=True,
        env=env,
    )
    s1 = _read_stat()
    if r.returncode != 0:
        print(r.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"cpus={cpus} worker failed")
    return json.loads(r.stdout.strip().splitlines()[-1]), _steal_pct(s0, s1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=str(REPO / ".localdata" / "sf1"))
    args = ap.parse_args()

    t32, steal32 = run_cell(32, args.sf_dir)
    t8, steal8 = run_cell(8, args.sf_dir)

    print("# CPU scaling at sf1 (replica data)")
    print()
    print(
        f"Best-of-2 noop-sink materialization per query, one fresh "
        f"subprocess JVM per core count (local[32] then local[8]), "
        f"`{args.sf_dir}`. steal%: c32 {steal32}, c8 {steal8}. "
        f"`c8/c32` ~4.0 = CPU-bound and parallel; ~1.0 = cores don't "
        f"help (named limiter required). Regenerate: "
        f"`python tools/cpu_scaling_sweep.py > CPU_SCALING_SF1.md`."
    )
    print()
    print("| query | c32 s | c8 s | c8/c32 |")
    print("|---|---|---|---|")
    for q in QUERIES:
        print(f"| {q} | {t32[q]:.2f} | {t8[q]:.2f} | {t8[q] / t32[q]:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
