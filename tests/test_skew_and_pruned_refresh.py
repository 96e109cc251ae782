"""Scale operators: salted skew join equals the plain join; the
incremental snapshot refresh prunes to the newest date partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from copenhagen_traffic_and_weather_etl_pipeline_spark.operators.skew import salted_join
from copenhagen_traffic_and_weather_etl_pipeline_spark.operators.snapshot import (
    refresh_snapshot_pruned,
)
from copenhagen_traffic_and_weather_etl_pipeline_spark.sinks import append_table


def test_salted_join_matches_plain_join(spark):
    # One hot key (90% of rows) plus a long tail.
    big = spark.range(2000).select(
        F.when(F.col("id") < 1800, 1).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 10).alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (1900, "cold"), (1950, "cold")], "k long, tag string"
    )
    plain = big.join(small, on=["k"]).select("k", "payload", "tag")
    salted = salted_join(big, small, on=["k"]).select("k", "payload", "tag")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    # The physical join key must include the salt on both sides.
    plan = spark._jvm.PythonSQLUtils.explainString(
        salted_join(big, small, on=["k"])._jdf.queryExecution(), "formatted"
    )
    assert "_salt" in plan


def test_salted_left_join_keeps_unmatched_rows(spark):
    big = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(1, "x")], "k long, tag string")
    out = salted_join(big, small, on=["k"], how="left")
    assert out.count() == 10
    assert out.filter(F.col("tag").isNotNull()).count() == 1


def test_refresh_snapshot_pruned_reads_one_partition(spark, tmp_path):
    cols = ["date", "time", "geo_name", "original_coordinates"]

    def facts(date: str, time: str, extra: str):
        rows = [
            (date, time, f"geo{i}", f"{i}.0,{i}.5", float(i)) for i in range(5)
        ]
        return spark.createDataFrame(
            rows, f"date string, time string, geo_name string, original_coordinates string, {extra} double"
        )

    tpath, wpath = str(tmp_path / "traffic"), str(tmp_path / "weather")
    for date, time in [("2026-08-12", "09:00"), ("2026-08-13", "10:00")]:
        append_table(facts(date, time, "speed"), tpath, partition_by=["date"])
        append_table(facts(date, time, "temp"), wpath, partition_by=["date"])

    snap = refresh_snapshot_pruned(spark, tpath, wpath, keys=cols)
    rows = snap.collect()
    assert len(rows) == 5
    # Partition discovery types the date directory values as DATE.
    assert {str(r["date"]) for r in rows} == {"2026-08-13"}

    # Pruning is static: the scans carry a date PartitionFilter.
    plan = spark._jvm.PythonSQLUtils.explainString(
        snap._jdf.queryExecution(), "formatted"
    )
    section = plan.split("PartitionFilters", 1)
    assert len(section) == 2
    assert "2026-08-13" in section[1]
