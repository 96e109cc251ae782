"""The streaming-replay registry entries (workload/streaming_replay_
queries.py) run the REAL Structured Streaming engine over time-split
micro-batches; their drained output must equal the batch closure of the
same semantics — the streaming/batch parity invariant the driver's
DuckDB oracle also checks."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import (
    REGISTRY,
    load,
)
from copenhagen_traffic_and_weather_etl_pipeline_spark.workload.streaming_replay_queries import (
    _GAP_US,
)

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_sessionize_stream_replay_matches_batch(spark):
    out = REGISTRY["sessionize_stream_replay"].fn(spark, SF)

    e = load(spark, SF, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > _GAP_US), 1).otherwise(0)
    sess = e.select(
        "user_id",
        "ts",
        F.sum(new_sess)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("sidx"),
    )
    batch = sess.groupBy("user_id", "sidx").agg(
        F.min("ts").alias("session_start"),
        (F.max("ts") + F.expr("INTERVAL 12 HOURS")).alias("session_end"),
        F.count("*").alias("n_events"),
    )
    cols = ["user_id", "session_start", "session_end", "n_events"]
    got, want = _rows(out, cols), _rows(batch, cols)
    assert len(want) > 0
    assert got == want


def test_stream_join_replay_matches_batch(spark):
    out = REGISTRY["stream_join_replay"].fn(spark, SF)

    e = load(spark, SF, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.round("value", 6).alias("purchase_value"),
    )
    batch = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.expr("view_ts + INTERVAL 1 HOUR")),
    )
    cols = ["user_id", "view_id", "purchase_id", "view_ts", "purchase_ts", "purchase_value"]
    got, want = _rows(out, cols), _rows(batch, cols)
    assert len(want) > 0  # 3 straddle-able pairs exist at sf0.001
    assert got == want
