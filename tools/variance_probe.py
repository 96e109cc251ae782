"""Attribute run-to-run variance of a query across fresh JVMs
(round-15 verdict item #4: the sf1 embedding-pair decades showed
±30% wall-time spread — cosine 47-114 s — across identical runs with
no explanation on record).

Per rep, a FRESH subprocess JVM runs the query once with three
instrument channels the sweep never had:

  1. JVM GC log (``-Xlog:gc*``) — total pause time and full-GC count,
     parsed from the unified-logging lines;
  2. Spark's own stage metrics via the UI REST API
     (``/api/v1/applications/<id>/stages``) — summed executorRunTime,
     jvmGcTime, memory/disk spill bytes, shuffle write bytes, task
     count and failures (the UI is enabled for the probe only);
  3. Python-worker churn — the parent polls for ``pyspark.daemon`` /
     ``pyspark.worker`` process PIDs during the run; distinct PIDs >>
     the concurrency width means workers are being torn down and
     restarted (each restart re-pays module import + Arrow init).

Output: one JSON line per rep plus a summary with min/max wall and the
per-channel values side by side, so "which channel moves with the wall
time" is read straight off the artifact.

Usage:
    python tools/variance_probe.py dedup_embedding_cosine --sf 1 --reps 4
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER_SRC = """
import json, os, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from copenhagen_traffic_and_weather_etl_pipeline_spark.session import get_spark
from copenhagen_traffic_and_weather_etl_pipeline_spark.testdata import sf_dir as resolve_sf
from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import REGISTRY

gc_log = {gc_log!r}
ui_port = {ui_port}
spark = get_spark(
    app_name="variance-probe",
    extra_conf={{
        "spark.ui.enabled": "true",
        "spark.ui.port": str(ui_port),
        "spark.driver.extraJavaOptions": "-Xlog:gc*:file=" + gc_log,
    }},
)
sf = resolve_sf({sf!r})
t0 = time.perf_counter()
REGISTRY[{query!r}].fn(spark, sf).write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0

app_id = spark.sparkContext.applicationId
base = f"http://127.0.0.1:{{ui_port}}/api/v1/applications/{{app_id}}"
stages = json.load(urllib.request.urlopen(base + "/stages?status=complete"))
agg = {{
    "wall_sec": round(wall, 2),
    "stages": len(stages),
    "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
    "failed_tasks": sum(s.get("numFailedTasks", 0) for s in stages),
    "executor_run_ms": sum(s.get("executorRunTime", 0) for s in stages),
    "jvm_gc_ms": sum(s.get("jvmGcTime", 0) for s in stages),
    "memory_spill_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
    "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
    "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
    "python_worker_init_ms": sum(
        s.get("executorMetrics", {{}}).get("pythonWorkerInitTime", 0)
        for s in stages
    ),
}}
print("PROBE_RESULT " + json.dumps(agg))
spark.stop()
"""


def _parse_gc_log(path: Path) -> dict:
    """Total pause ms + full-GC count from a -Xlog:gc* unified log."""
    total_ms = 0.0
    pauses = 0
    full = 0
    if not path.exists():
        return {"gc_pause_ms": None, "gc_pauses": None, "full_gcs": None}
    pat = re.compile(r"GC\(\d+\) Pause ([^)]*\)[^0-9]*)([0-9.]+)ms")
    for line in path.read_text(errors="replace").splitlines():
        m = pat.search(line)
        if m:
            pauses += 1
            total_ms += float(m.group(2))
            if "Full" in m.group(1):
                full += 1
    return {"gc_pause_ms": round(total_ms, 1), "gc_pauses": pauses, "full_gcs": full}


def _poll_worker_pids(stop: threading.Event, seen: set[int]) -> None:
    """Sample pyspark daemon/worker PIDs once a second while the rep
    runs; |seen| vs the concurrency width measures worker churn."""
    while not stop.is_set():
        try:
            out = subprocess.run(
                ["pgrep", "-f", "pyspark.daemon|pyspark.worker"],
                capture_output=True,
                text=True,
            ).stdout
            seen.update(int(p) for p in out.split())
        except Exception:
            pass
        stop.wait(1.0)


def run_rep(query: str, sf: str, rep: int) -> dict:
    gc_log = Path(tempfile.mkdtemp(prefix="vprobe_gc_")) / f"gc_{rep}.log"
    ui_port = 4050 + rep
    src = _WORKER_SRC.format(
        repo=str(REPO), gc_log=str(gc_log), ui_port=ui_port, sf=sf, query=query
    )
    seen: set[int] = set()
    stop = threading.Event()
    poller = threading.Thread(target=_poll_worker_pids, args=(stop, seen), daemon=True)
    poller.start()
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    stop.set()
    poller.join(timeout=3)
    rec: dict = {"rep": rep, "subprocess_wall_sec": round(time.perf_counter() - t0, 1)}
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_RESULT "):
            rec.update(json.loads(line[len("PROBE_RESULT "):]))
            break
    else:
        rec["error"] = (proc.stderr or proc.stdout)[-800:]
    rec.update(_parse_gc_log(gc_log))
    rec["python_worker_pids_seen"] = len(seen)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="1")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    reps = []
    for i in range(args.reps):
        rec = run_rep(args.query, args.sf, i)
        print(json.dumps(rec), flush=True)
        reps.append(rec)

    walls = [r["wall_sec"] for r in reps if "wall_sec" in r]
    if walls:
        summary = {
            "query": args.query,
            "sf": args.sf,
            "wall_min": min(walls),
            "wall_max": max(walls),
            "spread_pct": round(100.0 * (max(walls) - min(walls)) / min(walls), 1),
            "channels": {
                k: [r.get(k) for r in reps]
                for k in (
                    "wall_sec",
                    "jvm_gc_ms",
                    "gc_pause_ms",
                    "full_gcs",
                    "memory_spill_bytes",
                    "disk_spill_bytes",
                    "failed_tasks",
                    "python_worker_pids_seen",
                    "executor_run_ms",
                )
            },
        }
        print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
