"""The reference transports rows as CSV load jobs
(deployment_function.py:190, api_method='load_csv'). Fidelity check:
flattened fact rows survive a CSV round-trip under the explicit
StructType — no type drift, no null corruption."""

from __future__ import annotations

from pyspark.sql import functions as F

from copenhagen_traffic_and_weather_etl_pipeline_spark.operators.flatten import (
    flatten_traffic,
    split_errors,
)
from copenhagen_traffic_and_weather_etl_pipeline_spark.schemas import TRAFFIC_SCHEMA
from copenhagen_traffic_and_weather_etl_pipeline_spark.sources import fixtures, rest


def test_traffic_rows_roundtrip_csv(spark, tmp_path):
    fetched = rest.fetch_endpoints(
        rest.endpoints(spark, data_types=("traffic",)),
        rest.fixture_fetcher({"tomtom": (200, fixtures.tomtom_doc())}),
    )
    ok, _ = split_errors(fetched)
    t = flatten_traffic(ok, F.lit("2026-08-13"), F.lit("08:00"))

    path = str(tmp_path / "traffic_csv")
    t.write.option("header", True).csv(path)
    back = spark.read.schema(TRAFFIC_SCHEMA).option("header", True).csv(path)

    # File scans force nullable=true; names and types must be identical.
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in TRAFFIC_SCHEMA.fields
    ]
    orig = sorted(map(tuple, t.collect()))
    rt = sorted(map(tuple, back.collect()))
    assert rt == orig
