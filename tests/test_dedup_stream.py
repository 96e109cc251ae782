"""Streaming incremental dedup (streaming/dedup_stream.py): two
availableNow ticks over a document drop directory. Tick 2 must reject
documents already accepted in tick 1 (via the on-disk band-bucket
index), dedup within its own batch, and extend the index — across two
INDEPENDENT StreamingQuery instances, proving the state lives in the
parquet index, not in query memory."""

from __future__ import annotations

from copenhagen_traffic_and_weather_etl_pipeline_spark.streaming.dedup_stream import (
    run_dedup_tick,
)

SCHEMA = "doc_id long, text string"

A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
B = "one two three four five six seven eight nine ten"
C = "red green blue cyan magenta yellow black white gray pink"


def test_streaming_dedup_two_ticks_persistent_index(spark, tmp_path):
    drop = tmp_path / "drop"
    index = str(tmp_path / "index")
    accepted = str(tmp_path / "accepted")

    # Tick 1: two distinct docs -> both accepted, index bootstrapped.
    spark.createDataFrame([(1, A), (2, B)], SCHEMA).write.parquet(
        str(drop / "batch1")
    )
    run_dedup_tick(
        spark, str(drop / "batch1"), index, accepted, str(tmp_path / "ckpt1")
    )
    got1 = sorted(r["doc_id"] for r in spark.read.parquet(accepted).collect())
    assert got1 == [1, 2]

    # Tick 2 (fresh checkpoint = fresh query): 10 is a copy of doc 1
    # (reject via index), 11/12 copy each other (keep 11), 13 is new.
    spark.createDataFrame(
        [(10, A), (11, C), (12, C), (13, "x y z " + B)], SCHEMA
    ).write.parquet(str(drop / "batch2"))
    run_dedup_tick(
        spark, str(drop / "batch2"), index, accepted, str(tmp_path / "ckpt2")
    )
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(accepted).collect())
    assert got2 == [1, 2, 11, 13]

    # Index now covers every accepted doc: replaying the same batch
    # accepts nothing new.
    run_dedup_tick(
        spark, str(drop / "batch2"), index, accepted, str(tmp_path / "ckpt3")
    )
    got3 = sorted(r["doc_id"] for r in spark.read.parquet(accepted).collect())
    assert got3 == [1, 2, 11, 13]
