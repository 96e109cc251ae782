"""Repo-wide physical-plan lint: every registry query's plan is scanned
for scale antipatterns. Complements tests/test_plan_quality.py (deep
hand-written gates for ~45 queries) with shallow automated coverage of
ALL queries — a new query with a cartesian product, a row-at-a-time
Python UDF, or an unjustified single-partition funnel fails the audit
even if nobody wrote it a dedicated gate.

Classification (copenhagen_traffic_and_weather_etl_pipeline_spark/plans/audit.py):

- ``cartesian``      CartesianProduct node — always a violation.
- ``row_python``     BatchEvalPython (row-at-a-time UDF) — always a
                     violation (Arrow paths show as ArrowEvalPython /
                     MapInPandas, which are allowed).
- ``nested_loop``    BroadcastNestedLoopJoin: auto-allowed when the
                     broadcast side is a scalar (no-keys) aggregate or a
                     literal table; otherwise needs an ALLOW entry.
- ``single_part``    single-partition exchange: auto-allowed when it
                     feeds a final aggregate merge or a limit; a
                     Sort/Window consumer needs an ALLOW entry stating
                     why the input frame is bounded (manifest-,
                     histogram-, bucket- or model-sized — never fact-
                     table-sized). The lint machine-verifies the
                     structural half where it can: ``window-preagg``
                     means the exchange input provably passed through
                     an aggregate with only row-preserving operators in
                     between (aggregate-bounded volume funnels — groups
                     x upstream-partitions for a partial — not fact
                     rows); bare ``window`` means raw or possibly-
                     multiplied rows funnel and the whole justification
                     is prose — the CI audit pins that set exactly.

Usage:
    python tools/plan_audit.py            # audit, print table, exit 1 on violations
    python tools/plan_audit.py --md       # emit PLAN_AUDIT.md content
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from copenhagen_traffic_and_weather_etl_pipeline_spark.testdata import sf_dir  # noqa: E402

SF_DIR = sf_dir("0.001")

# query -> {flag: reason}. A reason documents why the hit is the plan we
# WANT at 100 TB; anything flagged without a reason fails the audit.
_BUCKET_WINDOW = (
    "unpartitioned window runs over bucket-cardinality offsets "
    "(N/bucket_size rows), not the fact table; recurse the two-level "
    "trick at 100 TB"
)
_HISTOGRAM_WINDOW = (
    "unpartitioned window runs over a value histogram (distinct "
    "durations / digits / scores), bounded by the value domain, never "
    "by row count"
)
_MANIFEST_WINDOW = (
    "unpartitioned window runs over the file manifest (one row per "
    "file), not the data"
)
_SPINE_WINDOW = (
    "unpartitioned window runs over the pre-aggregated date/hour spine "
    "(calendar-sized after the partial-capable aggregate)"
)
ALLOW: dict[str, dict[str, str]] = {
    "assign_contiguous_ids": {"single_part": _BUCKET_WINDOW},
    "equidepth_histogram": {"single_part": _BUCKET_WINDOW},
    "compaction_plan": {"single_part": _MANIFEST_WINDOW},
    "kaplan_meier_retention": {"single_part": _HISTOGRAM_WINDOW},
    "running_distinct_users": {
        # Machine-verified `window-preagg` since round 15: the former
        # spine-LEFT-JOIN-aggregate shape (which the lint could not
        # prove row-preserving) was folded into one union-fed day
        # aggregate, so the preagg walk proves the funnel is
        # |days|-sized.
        "single_part": _SPINE_WINDOW
    },
    "revenue_mom_growth": {"single_part": _SPINE_WINDOW},
    "daily_counts_gapfilled": {"single_part": _SPINE_WINDOW},
    "interpolate_hourly_values": {
        "single_part": _SPINE_WINDOW,
        "nested_loop": "broadcast side is the gap-capped hour spine "
        "crossed with the n_types-cardinality frame — both spine-sized "
        "(never the fact table, which collapses to the hourly "
        "aggregate first)",
    },
    "skyline_orders": {
        "single_part": "global skyline window runs over per-day maxima "
        "(date-cardinality pre-aggregate), not raw orders"
    },
    "sim_topk_bruteforce": {
        "nested_loop": "broadcast side is the query point — a key-equal "
        "point select (one vector by construction); the join is the "
        "deliberate score-all-corpus baseline next to the pruned ANN "
        "paths"
    },
    "ann_recall_eval": {
        "nested_loop": "broadcast sides are the query point and the "
        "ground-truth top-k (point select + limit-bounded frames)"
    },
    "rolling_7d_active_users": {
        "nested_loop": "non-equi interval join against the broadcast "
        "date spine (calendar-sized: one row per day); the fact side "
        "was already reduced to per-user-per-day"
    },
}


def audit(spark):
    """Returns (per-query flag dict, [(query, flag)] violations)."""
    from copenhagen_traffic_and_weather_etl_pipeline_spark.plans.audit import (
        nested_loop_joins,
        single_partition_consumers,
    )
    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import REGISTRY

    hits: dict[str, dict[str, str]] = {}
    violations: list[tuple[str, str]] = []
    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, SF_DIR)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            violations.append((name, f"plan-build-error: {e}"))
            continue
        # Scan the FULL formatted output (main tree + every subquery
        # section) — a CartesianProduct or BatchEvalPython inside a
        # scalar/IN subquery plan is just as much a violation as one in
        # the main tree.
        qhits: dict[str, str] = {}
        if "CartesianProduct" in plan:
            qhits["cartesian"] = "cartesian product"
        if "BatchEvalPython" in plan:
            qhits["row_python"] = "row-at-a-time Python UDF"
        nl = [v for v in nested_loop_joins(plan) if v == "unbounded"]
        if nl:
            qhits["nested_loop"] = f"{len(nl)} unbounded nested-loop join(s)"
        sp = [
            (c, v)
            for c, v in single_partition_consumers(plan)
            if v not in ("agg-final", "limit")
        ]
        if sp:
            qhits["single_part"] = "; ".join(f"{c} ({v})" for c, v in sp)
        if qhits:
            hits[name] = qhits
        for flag in qhits:
            if flag not in ALLOW.get(name, {}):
                violations.append((name, flag))
    return hits, violations


def main() -> int:
    from copenhagen_traffic_and_weather_etl_pipeline_spark.session import get_spark
    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import REGISTRY

    spark = get_spark(app_name="plan-audit")
    hits, violations = audit(spark)

    if "--md" in sys.argv:
        print("# PLAN_AUDIT — automated scale-antipattern lint\n")
        print(
            "Every registry query's formatted physical plan, scanned for "
            "cartesian products, row-at-a-time Python, unbounded "
            "nested-loop joins, and single-partition funnels (see "
            "`tools/plan_audit.py`; graph analysis in "
            "`copenhagen_traffic_and_weather_etl_pipeline_spark/plans/audit.py`). "
            "Scalar-broadcast nested loops and partial-merge exchanges "
            "are auto-cleared; every remaining hit carries its "
            "justification below. Window funnels additionally carry a "
            "machine-checked grade: `window-preagg` means the lint "
            "PROVED the exchange input is an aggregate's output "
            "reached through row-preserving operators only (an "
            "aggregate-bounded volume funnels — groups x "
            "upstream-partitions for a partial — never fact rows); "
            "bare `window` "
            "means the justification is prose-only, and CI pins that "
            "set exactly. The audit runs in CI "
            "(`tests/test_plan_audit.py`) — an unjustified hit fails.\n"
        )
        print(
            f"Queries audited: **{len(REGISTRY)}**; clean: "
            f"**{len(REGISTRY) - len(hits)}**; flagged-and-justified: "
            f"**{len(hits) - len({n for n, _ in violations})}**; violations: "
            f"**{len(violations)}**\n"
        )
        print("| query | finding | why this is the plan we want |")
        print("|---|---|---|")
        for n in sorted(hits):
            for flag, what in hits[n].items():
                reason = ALLOW.get(n, {}).get(flag, "**VIOLATION**")
                print(f"| {n} | {flag}: {what} | {reason} |")
    else:
        for n in sorted(hits):
            fl = list(hits[n])
            status = "OK " if all(f in ALLOW.get(n, {}) for f in fl) else "BAD"
            print(f"[{status}] {n}: {hits[n]}")
        print(f"\n{len(REGISTRY)} audited, {len(hits)} flagged, "
              f"{len(violations)} violations")
        for n, f in violations:
            print(f"VIOLATION: {n}: {f}")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
