"""As-of and interval joins (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

from copenhagen_traffic_and_weather_etl_pipeline_spark.operators.temporal import (
    asof_join,
    interval_join,
)


def _ts(h, m=0):
    return datetime(2026, 8, 12, h, m)


def test_asof_join_backward_with_ties_and_misses(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10, 5), "a"),   # after r@10:00 -> 100
            (1, _ts(10, 30), "b"),  # tie with r@10:30 -> 200 (>= includes equal)
            (1, _ts(9, 0), "c"),    # before any right row -> null
            (2, _ts(12, 0), "d"),   # key with no right rows -> null
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10, 0), 100.0), (1, _ts(10, 30), 200.0)],
        "user_id long, ts timestamp, payload double",
    )
    got = {
        r["tag"]: r["payload"]
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert got == {"a": 100.0, "b": 200.0, "c": None, "d": None}


def test_asof_join_keeps_all_left_rows_and_columns(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "x"), (1, _ts(11), "y")], "k long, ts timestamp, v string"
    )
    right = spark.createDataFrame(
        [(1, _ts(9), 5)], "k long, ts timestamp, p long"
    )
    out = asof_join(left, right, on=["k"])
    assert sorted(out.columns) == ["k", "p", "ts", "v"]
    assert out.count() == 2


def test_interval_join_broadcast_and_bucketed_agree(spark):
    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 9.99, 10.0, 25.0, 99.9, 100.0])],
        "pid long, value double",
    )
    intervals = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 50.0), (2, 50.0, 100.0)],
        "band_id long, lo double, hi double",
    )
    bc = interval_join(points, intervals, "value")
    bk = interval_join(points, intervals, "value", bucket_width=7.0)
    expected = {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}  # pid -> band; 100.0 matches none
    for out in (bc, bk):
        got = {r["pid"]: r["band_id"] for r in out.collect()}
        assert got == expected


def test_asof_join_null_payload_row_still_wins(spark):
    """A right row whose payload is NULL is still the LATEST right row:
    real ASOF semantics carry it (purchase happened, value unknown) —
    per-column last(ignorenulls) would resurrect the older 5.0. Also
    pins that multiple payload columns come from the SAME right row."""
    left = spark.createDataFrame(
        [(1, _ts(20), "click")], "k long, ts timestamp, v string"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 5.0, "a"), (1, _ts(15), None, "b")],
        "k long, ts timestamp, p double, tag string",
    )
    row = asof_join(left, right, on=["k"]).first()
    assert row["p"] is None and row["tag"] == "b"
