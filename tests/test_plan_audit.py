"""The repo-wide plan lint as a CI gate: every registry query's physical
plan is scanned for scale antipatterns (tools/plan_audit.py); any hit
without a documented justification fails. Also unit-tests the
formatted-plan parser the lint is built on."""

from __future__ import annotations

import sys
from pathlib import Path

from copenhagen_traffic_and_weather_etl_pipeline_spark.plans.audit import (
    nested_loop_joins,
    parse_formatted_plan,
    single_partition_consumers,
)
from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import REGISTRY
from copenhagen_traffic_and_weather_etl_pipeline_spark.testdata import sf_dir

SF_DIR = sf_dir("0.001")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parser_reconstructs_tree_and_details(spark):
    plan = _plan(spark, "assign_contiguous_ids")
    nodes = parse_formatted_plan(plan)
    assert nodes, "no nodes parsed"
    roots = [n for n in nodes.values() if n.parent is None]
    assert len(roots) == 1  # single root (AdaptiveSparkPlan)
    # Every exchange got its details block attached.
    for n in nodes.values():
        if n.name == "Exchange":
            assert "Arguments:" in n.details


def test_scalar_broadcast_pattern_is_recognized(spark):
    # mutual_information folds N in as a broadcast 1-row aggregate: its
    # nested-loop joins must classify as scalar-broadcast, never
    # unbounded. (flagship's equivalent fold compiles to a
    # BroadcastHashJoin Cross in Spark 4, so it never reaches the
    # nested-loop classifier at all — also fine.)
    plan = _plan(spark, "mutual_information_event_value")
    verdicts = nested_loop_joins(plan)
    assert verdicts and all(v == "scalar-broadcast" for v in verdicts)
    assert not nested_loop_joins(_plan(spark, "flagship_latest_snapshot"))


def test_global_agg_single_partition_classifies_agg_final(spark):
    plan = _plan(spark, "global_max_agg")
    consumers = single_partition_consumers(plan)
    assert consumers and all(v == "agg-final" for _, v in consumers)


def test_bucket_ranking_single_partition_classifies_window_preagg(spark):
    # The bucket-offset window is by design — AND its input must
    # machine-verify as an aggregate's output (group cardinality
    # funnels, not fact rows).
    plan = _plan(spark, "assign_contiguous_ids")
    verdicts = [v for _, v in single_partition_consumers(plan)]
    assert "window-preagg" in verdicts


def test_full_registry_plan_audit_has_no_violations(spark):
    import plan_audit

    hits, violations = plan_audit.audit(spark)
    assert not violations, (
        "unjustified scale antipatterns (add a fix, or an ALLOW entry "
        f"with a reason in tools/plan_audit.py): {violations}"
    )
    # The allowlist must not rot: every ALLOW entry refers to a real,
    # currently-flagged query+flag.
    stale = [
        (n, f)
        for n, flags in plan_audit.ALLOW.items()
        for f in flags
        if f not in hits.get(n, {})
    ]
    assert not stale, f"stale ALLOW entries (no longer flagged): {stale}"
    # Single-partition window funnels split into two grades: `window-
    # preagg` is machine-verified (the exchange input is an aggregate's
    # output reached through row-preserving operators — group
    # cardinality funnels, never fact rows), while bare `window` means
    # the lint could NOT prove it (raw or possibly-multiplied rows) and
    # the justification lives entirely in prose. Pin the prose-only set
    # exactly: a new member means either fix the plan or consciously
    # extend this pin alongside its ALLOW entry. Empty since round 15 —
    # running_distinct_users, the last holdout, was rewritten so its
    # day spine comes from a union-fed aggregate the preagg walk can
    # prove (round-14 verdict item #4); all 12 funnels machine-verify.
    raw_window = {
        n
        for n, flags in hits.items()
        if "(window)" in flags.get("single_part", "")
    }
    assert raw_window == set(), raw_window


def test_no_registry_query_outputs_nonscalar_columns(spark):
    # The driver's canonicalizer (pandas sort_values over stringified
    # cells) cannot hash list/map/struct cells — round 2 lost two
    # queries to exactly this. Every registry output column must be
    # scalar; serialize arrays as ordered strings on BOTH engines.
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    offenders = []
    for name, spec in REGISTRY.items():
        schema = spec.fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType, BinaryType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, f"non-scalar output columns: {offenders}"
