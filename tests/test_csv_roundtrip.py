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


def test_json_corrupt_records_are_isolated_not_fatal(spark, tmp_path):
    """PERMISSIVE ingestion: malformed lines land in _corrupt_record
    instead of failing the read — the batch sibling of the fetch error
    channel (O2), and the only sane default when one bad line in a
    100 TB drop must not kill the job."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    p = tmp_path / "mixed.json"
    p.write_text(
        '{"event_id": 1, "v": 10.0}\n'
        "THIS IS NOT JSON\n"
        '{"event_id": 2, "v": 20.0}\n'
        '{"event_id": 3, "v": '  # truncated record
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("v", T.DoubleType(), True),
            T.StructField("_corrupt_record", T.StringType(), True),
        ]
    )
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(str(p))
    # Spark refuses queries whose pruned column set is ONLY the internal
    # corrupt column (the parser would have nothing to parse); cache the
    # parsed frame first — the documented pattern.
    df = df.cache()
    try:
        ok = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert {r.event_id for r in ok.collect()} == {1, 2}
        assert bad.count() == 2
    finally:
        df.unpersist()
