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

from copenhagen_traffic_and_weather_etl_pipeline_spark.testdata import sf_dir

SF = sf_dir("0.001")


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


def test_session_window_gap_boundary_extends(spark, tmp_path):
    """The replay oracle splits sessions on diff > gap (strictly): an
    event at exactly ``last_ts + gap`` must EXTEND the session, and
    ``session_end`` must be ``last_ts + gap``. This pins the Spark
    semantics the DuckDB oracle mirrors — if a Spark upgrade ever flips
    the boundary to half-open splitting, this fails before the driver
    gate does."""
    import json

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    t0 = 1_700_000_000 * 1_000_000
    gap_us = 30 * 60 * 1_000_000
    rows = [
        {"event_id": 1, "ts_us": t0, "user_id": 1, "event_type": "e", "value": 1.0},
        # exactly one gap after the first event: same session
        {"event_id": 2, "ts_us": t0 + gap_us, "user_id": 1, "event_type": "e", "value": 1.0},
        # one gap + 1 microsecond after the second: new session
        {"event_id": 3, "ts_us": t0 + 2 * gap_us + 1, "user_id": 1, "event_type": "e", "value": 1.0},
    ]
    (in_dir / "t1.json").write_text("\n".join(json.dumps(r) for r in rows))

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(
            "event_id long, ts_us long, user_id long, event_type string, value double"
        )
        .json(str(in_dir))
        .withColumn("ts", F.timestamp_micros("ts_us"))
    )
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros("w.start").alias("start_us"),
            F.unix_micros("w.end").alias("end_us"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("gap_boundary")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["start_us"], r["end_us"], r["n_events"])
        for r in spark.table("gap_boundary").collect()
    )
    assert got == [
        (t0, t0 + 2 * gap_us, 2),              # events 1+2 merged; end = last + gap
        (t0 + 2 * gap_us + 1, t0 + 3 * gap_us + 1, 1),
    ]


def test_replay_runs_multiple_stateful_micro_batches(spark):
    """Engine-level evidence that the replays exercise REAL cross-batch
    streaming state (not a single-batch batch-equivalent): the drained
    session query must have run one micro-batch per tick file (2 ticks;
    the sentinel flush row rides tick 2 since round 8) plus the
    watermark-flush no-data batch, with state-store rows carried
    between batches; the join query must run its two ticks through a
    symmetric stateful join."""
    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload.streaming_replay_queries import (
        _drain,
        _join_streams,
        _session_stream,
        _stage_ticks,
    )

    in_dir, out_dir, ckpt = _stage_ticks(spark, SF, sentinel=True)
    q = _drain(_session_stream(spark, in_dir), out_dir, ckpt)
    progress = [p for p in q.recentProgress if p is not None]
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) >= 2  # tick1, tick2(+sentinel) — one batch each
    state = [
        op
        for p in progress
        for op in p.get("stateOperators", [])
        if "session" in op.get("operatorName", "").lower()
    ]
    assert state, "no session-window state operator in progress"
    assert max(op["numRowsTotal"] for op in state) > 0

    in_dir, out_dir, ckpt = _stage_ticks(spark, SF, sentinel=False)
    qj = _drain(_join_streams(spark, in_dir), out_dir, ckpt)
    jprogress = [p for p in qj.recentProgress if p is not None]
    assert len([p for p in jprogress if p["numInputRows"] > 0]) >= 2
    jstate = [
        op
        for p in jprogress
        for op in p.get("stateOperators", [])
        if "join" in op.get("operatorName", "").lower()
    ]
    assert jstate, "no stream-stream join state operator in progress"
    assert max(op["numRowsTotal"] for op in jstate) > 0


def test_sessionize_replay_restarts_from_checkpoint(spark, tmp_path):
    """Kill-and-restart resilience of the session replay path: run 1
    drains only tick 1, the query 'dies', run 2 restarts from the same
    checkpoint, discovers tick 2 + the sentinel, and resumes the
    state — tick 1 is NOT reprocessed (file-source log) and sessions
    open at the kill point are extended, not duplicated. The final sink
    must still equal the batch closure: the restart-safety claim a
    1000-executor deployment actually relies on."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload.streaming_replay_queries import (
        _drain,
        _session_stream,
        _stage_ticks,
    )

    in_dir, out_dir, ckpt = _stage_ticks(spark, SF, sentinel=True)
    hold = tmp_path / "hold"
    hold.mkdir()
    later = [f for f in sorted(os.listdir(in_dir)) if f != "01.json"]
    for f in later:
        shutil.move(os.path.join(in_dir, f), hold / f)

    # Run 1: only tick 1 exists; most of its sessions flush, the rest
    # stay in the state store when the query terminates.
    _drain(_session_stream(spark, in_dir), out_dir, ckpt)
    n_run1 = spark.read.parquet(out_dir).count()

    # Run 2: restart from the same checkpoint with the rest of the
    # stream present.
    for f in later:
        shutil.move(str(hold / f), os.path.join(in_dir, f))
    _drain(_session_stream(spark, in_dir), out_dir, ckpt)

    out = spark.read.parquet(out_dir).filter(F.col("user_id") >= 0)

    e = load(spark, SF, "events")
    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload.streaming_replay_queries import (
        _GAP_US,
    )
    from pyspark.sql import Window as W

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
    assert 0 < n_run1 < len(want)  # run 1 emitted some but not all
    assert got == want


def test_replay_cleans_its_temp_base(spark):
    # Bench and the driver invoke the replays repeatedly; each call must
    # leave only the parquet sink (lazily read by the returned frame) in
    # its mkdtemp base — staged ticks, checkpoint, AND the stage1/stage2
    # split dirs go, and the base itself is registered for atexit
    # removal. Before round 7 each call leaked roughly one events-table
    # copy of staging to /tmp.
    import glob
    import os

    df = REGISTRY["stream_join_replay"].fn(spark, SF)
    df.count()  # materialize from the sink while it still exists
    bases = glob.glob(os.path.join("/tmp", "cph_stream_replay_*"))
    assert bases, "replay temp base should exist until process exit"
    newest = max(bases, key=os.path.getmtime)
    leftovers = sorted(os.listdir(newest))
    assert leftovers == ["out"], f"staging leaked next to the sink: {leftovers}"


def test_stage_ticks_quarantines_pre_epoch_and_epoch_zero(spark, tmp_path):
    """Watermark-poisoning guard (eraboost): Spark's event-time
    watermark initializes at epoch 0, so pre-1970 rows are born-late
    (dropped inside the stateful operator) and rows at exactly epoch 0
    sit on the initial-watermark boundary (the stream-stream join drops
    them on one side). The staging quarantines ts <= epoch before the
    watermark; the oracles carry the identical predicate."""
    import json
    import os

    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload.streaming_replay_queries import (
        _cleanup_staging,
        _stage_ticks,
    )

    src = str(tmp_path / "sf")
    os.makedirs(src)
    spark.createDataFrame(
        [
            (1, "1969-07-20 20:17:40", 1, "view", 1.0),
            (2, "1970-01-01 00:00:00", 1, "purchase", 2.0),
            (3, "2026-01-01 10:00:00", 1, "view", 3.0),
            (4, "2026-01-01 10:30:00", 1, "purchase", 4.0),
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "props", F.lit(None).cast("string")
    ).write.parquet(f"{src}/events.parquet")

    in_dir, _out, _ckpt = _stage_ticks(spark, src, sentinel=False)
    try:
        staged = []
        for f in os.listdir(in_dir):
            with open(os.path.join(in_dir, f)) as fh:
                staged += [json.loads(line) for line in fh if line.strip()]
        ids = sorted(r["event_id"] for r in staged)
        assert ids == [3, 4], f"pre-epoch/epoch-0 rows must be quarantined: {ids}"
        assert all(r["ts_us"] > 0 for r in staged)
    finally:
        _cleanup_staging(os.path.dirname(in_dir))


def test_stage_ticks_single_timestamp_corpus(spark, tmp_path):
    """Degenerate corpus: every event at ONE timestamp. The time-split
    cutoff lands on that instant, so tick 1 is empty — partitionBy
    writes no directory for an absent value and the stager must supply
    an empty tick file (a 0-row micro-batch) so the replay still drains
    and equals the batch closure (here: one session per user)."""
    import os

    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload.streaming_replay_queries import (
        _drain,
        _session_stream,
        _stage_ticks,
    )

    src = tmp_path / "sf-degen"
    src.mkdir()
    one_ts = "2026-08-15 12:00:00"
    spark.range(0, 6).select(
        F.col("id").alias("event_id"),
        F.lit(one_ts).cast("timestamp").alias("ts"),
        (F.col("id") % 2).alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
    ).write.parquet(str(src / "events.parquet"))
    # the loader's replica fallback needs the sentinel table present
    spark.range(1).selectExpr("id AS l_orderkey").write.parquet(
        str(src / "lineitem.parquet")
    )

    in_dir, out_dir, ckpt = _stage_ticks(spark, str(src), sentinel=True)
    files = sorted(os.listdir(in_dir))
    assert files == ["01.json", "02.json"]
    assert os.path.getsize(os.path.join(in_dir, "01.json")) == 0  # empty tick
    _drain(_session_stream(spark, in_dir), out_dir, ckpt)
    out = spark.read.parquet(out_dir).filter(F.col("user_id") >= 0)
    got = _rows(out, ["user_id", "n_events"])
    assert got == [(0, 3), (1, 3)]  # one session per user, all events in it
