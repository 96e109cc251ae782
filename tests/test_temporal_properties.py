"""Property tests for the temporal join operators (operators/temporal.py):
random keyed event sets vs brute-force Python references. The oracle
queries pin one dataset at one SF; these pin the SEMANTICS — backward
as-of tie handling, half-open interval boundaries, and the equivalence
of the bucket-aligned scale path to the broadcast path."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from copenhagen_traffic_and_weather_etl_pipeline_spark.operators.temporal import (
    asof_join,
    interval_join,
)

_BASE = datetime(2026, 1, 1)


events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=50),  # minutes offset
        st.integers(min_value=0, max_value=99),  # payload
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=events, right=events)
def test_asof_join_matches_bruteforce(spark, left, right):
    # Right side unique per (key, ts): keep max payload (documented
    # contract — pre-aggregated right side).
    rdict = {}
    for k, m, v in right:
        rdict[(k, m)] = max(v, rdict.get((k, m), -1))
    rrows = [
        (k, _BASE + timedelta(minutes=m), v) for (k, m), v in sorted(rdict.items())
    ]
    lrows = [
        (k, _BASE + timedelta(minutes=m), i)
        for i, (k, m, _) in enumerate(left)
    ]
    ldf = spark.createDataFrame(
        lrows or [(0, _BASE, -1)], "k long, ts timestamp, lid long"
    )
    rdf = spark.createDataFrame(
        rrows or [(99, _BASE, 0)], "k long, ts timestamp, val long"
    )
    got = {
        (r["k"], r["ts"], r["lid"]): r["val"]
        for r in asof_join(ldf, rdf, on=["k"]).collect()
    }

    for k, ts, lid in [tuple(r) for r in (lrows or [(0, _BASE, -1)])]:
        preceding = [
            (rts, v) for (rk, rts, v) in rrows or [(99, _BASE, 0)]
            if rk == k and rts <= ts
        ]
        expect = max(preceding)[1] if preceding else None
        assert got[(k, ts, lid)] == expect, (k, ts, lid)
    assert len(got) == len(lrows or [(0, _BASE, -1)])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(
        st.floats(min_value=0, max_value=100, allow_nan=False), max_size=25
    ),
    ivs=st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=90, allow_nan=False),
            st.floats(min_value=0.5, max_value=15, allow_nan=False),
        ),
        max_size=8,
    ),
)
def test_interval_join_broadcast_and_bucketed_agree_with_bruteforce(
    spark, points, ivs
):
    prows = [(i, float(p)) for i, p in enumerate(points)] or [(0, -1.0)]
    irows = [
        (j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(ivs)
    ] or [(0, -10.0, -5.0)]
    pdf = spark.createDataFrame(prows, "pid long, x double")
    idf = spark.createDataFrame(irows, "iid long, lo double, hi double")

    expect = {
        (pid, iid)
        for pid, x in prows
        for iid, lo, hi in irows
        if lo <= x < hi
    }
    broadcast = {
        (r["pid"], r["iid"])
        for r in interval_join(pdf, idf, "x").collect()
    }
    bucketed = {
        (r["pid"], r["iid"])
        for r in interval_join(pdf, idf, "x", bucket_width=7.0).collect()
    }
    assert broadcast == expect
    assert bucketed == expect
