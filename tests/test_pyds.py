"""Spark 4 Python Data Source (S1 option (a)): the rest_endpoints format
scans the 20x2 fan-out with explicit partitions and per-row fault
capture, never touching the network in fixture mode."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from copenhagen_traffic_and_weather_etl_pipeline_spark.operators.flatten import (
    flatten_traffic,
    split_errors,
)
from copenhagen_traffic_and_weather_etl_pipeline_spark.sources import fixtures
from copenhagen_traffic_and_weather_etl_pipeline_spark.sources.pyds import (
    RestEndpointsDataSource,
)


def _read(spark, responses: dict, **opts):
    spark.dataSource.register(RestEndpointsDataSource)
    reader = (
        spark.read.format("rest_endpoints")
        .option("responses", json.dumps(responses))
        .option("tries", "1")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_datasource_fetches_all_endpoints(spark):
    responses = {
        "tomtom": (200, json.dumps(fixtures.tomtom_doc())),
        "openweathermap": (200, json.dumps(fixtures.openweather_doc())),
    }
    df = _read(spark, responses, num_partitions="4")
    assert df.count() == 40
    assert df.filter(F.col("status_code") == 200).count() == 40
    assert df.filter(F.col("error").isNotNull()).count() == 0
    # Downstream flattening composes unchanged with the mapInPandas path.
    ok, bad = split_errors(df)
    t = flatten_traffic(
        ok.filter(F.col("data_type") == "traffic"),
        F.lit("2026-08-13"),
        F.lit("07:00"),
    )
    assert t.count() == 20
    assert len(t.columns) == 15


def test_datasource_fault_isolation(spark):
    # Traffic endpoints match nothing -> 404 -> error rows; weather fine.
    responses = {"openweathermap": (200, json.dumps(fixtures.openweather_doc()))}
    df = _read(spark, responses)
    bad = df.filter(F.col("error").isNotNull())
    assert bad.count() == 20
    assert {r.data_type for r in bad.select("data_type").distinct().collect()} == {
        "traffic"
    }
    assert df.filter(F.col("error").isNull()).count() == 20
