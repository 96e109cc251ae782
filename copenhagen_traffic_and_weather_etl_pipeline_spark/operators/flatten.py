"""JSON flattening: fetch-results -> typed fact rows.

Re-expresses the reference's row-at-a-time ``handle_traffic_data`` /
``handle_weather_data`` (deployment_function.py:92-127, :131-178) as set
operations: one ``from_json`` + one ``select`` per source. The whole
transform is a narrow, shuffle-free pipeline — at 100 TB of payloads it
parallelizes per input split with no data movement.

Fault isolation (O2, deployment_function.py:123-125, :174-176): a payload
missing required fields yields NULLs from ``from_json``; those rows are
split out into an error channel instead of failing the job — the per-row
analogue of the reference's try/except-drop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import (
    compose_event_ts,
    coord_string,
    kelvin_to_celsius,
    stamp_audit_columns,
)
from ..schemas import (
    OPENWEATHER_RESPONSE_SCHEMA,
    TOMTOM_RESPONSE_SCHEMA,
    TRAFFIC_SCHEMA,
    WEATHER_SCHEMA,
)

# Payload-derived columns per source. The reference raises KeyError (and
# drops the whole row) when ANY of these is missing from the API JSON
# (deployment_function.py:123-125, :174-176) — so the null-gate is a
# conjunction over all of them, not a single sentinel field.
_TRAFFIC_REQUIRED = [
    "road_class",
    "current_speed",
    "free_flow_speed",
    "current_travel_time",
    "free_flow_travel_time",
    "confidence",
    "road_closure",
    "first_coordinates",
    "last_coordinates",
]
_WEATHER_REQUIRED = [
    "country",
    "city_area_name",
    "weather_main",
    "weather_description",
    "temperature",
    "feels_like",
    "temp_min",
    "temp_max",
    "pressure",
    "humidity_percent",
    "visibility",
    "wind_speed",
    "wind_direction_degrees",
    "cloudiness_percent",
]


def _all_present(cols: list[str]) -> Column:
    pred = F.lit(True)
    for c in cols:
        pred = pred & F.col(c).isNotNull()
    return pred


def _audit_cols(stamp_date: Column | None, stamp_time: Column | None) -> list[Column]:
    """P8: run-time date/time string stamps (deployment_function.py:61-63)."""
    if stamp_date is not None and stamp_time is not None:
        return [stamp_date.alias("date"), stamp_time.alias("time")]
    stamps = stamp_audit_columns()
    return [stamps["date"].alias("date"), stamps["time"].alias("time")]


def flatten_traffic(
    fetch_df: DataFrame,
    stamp_date: Column | None = None,
    stamp_time: Column | None = None,
) -> DataFrame:
    """TomTom payloads -> traffic_table rows (P1, P3, P4, P6, P7, P8).

    Mirrors deployment_function.py:92-127: nested-field extraction from
    ``flowSegmentData.*``, first/last coordinate via element_at 1 / -1
    (the reference's [0] / [-1], :102-103), "lat,lon" concat columns,
    and the fixed 15-column output order of the DDL
    (bigquery_table_creation_queries.sql:22-38).

    Rows whose payload lacks ``flowSegmentData`` are dropped (the
    reference returns None and skips export: :123-125, :212-214).
    """
    doc = F.from_json(F.col("payload"), TOMTOM_RESPONSE_SCHEMA)
    seg = doc["flowSegmentData"]
    # try_element_at: ANSI-safe [0]/[-1] — an empty/missing coordinate array
    # yields NULL (row then dropped by the null-gate) instead of an
    # INVALID_ARRAY_INDEX task failure.
    first = F.try_element_at(seg["coordinates"]["coordinate"], F.lit(1))
    last = F.try_element_at(seg["coordinates"]["coordinate"], F.lit(-1))
    out = fetch_df.select(
        *_audit_cols(stamp_date, stamp_time),
        F.col("geo_name"),
        F.col("lat").alias("latitude"),
        F.col("lon").alias("longitude"),
        seg["frc"].alias("road_class"),
        seg["currentSpeed"].alias("current_speed"),
        seg["freeFlowSpeed"].alias("free_flow_speed"),
        seg["currentTravelTime"].alias("current_travel_time"),
        seg["freeFlowTravelTime"].alias("free_flow_travel_time"),
        seg["confidence"].alias("confidence"),
        seg["roadClosure"].alias("road_closure"),
        coord_string(F.col("lat"), F.col("lon")).alias("original_coordinates"),
        coord_string(first["latitude"], first["longitude"]).alias(
            "first_coordinates"
        ),
        coord_string(last["latitude"], last["longitude"]).alias(
            "last_coordinates"
        ),
    )
    # All-or-nothing drop: any missing payload field nulls its column and
    # the row is dropped, like the reference's KeyError path.
    return out.filter(_all_present(_TRAFFIC_REQUIRED)).select(
        *[F.col(f.name).cast(f.dataType) for f in TRAFFIC_SCHEMA.fields]
    )


def flatten_weather(
    fetch_df: DataFrame,
    stamp_date: Column | None = None,
    stamp_time: Column | None = None,
) -> DataFrame:
    """OpenWeather payloads -> weather_table rows (P2, P3, P4, P5, P6, P8).

    Mirrors deployment_function.py:131-178: ``weather[0].*`` array index,
    ``main.*`` nested scalars, Kelvin→Celsius on the four temperature
    columns (:140-143), and the 18-column DDL order
    (bigquery_table_creation_queries.sql:1-20).
    """
    doc = F.from_json(F.col("payload"), OPENWEATHER_RESPONSE_SCHEMA)
    # ANSI-safe weather[0]: empty array -> NULL -> row dropped, like the
    # reference's IndexError/KeyError drop (deployment_function.py:174-176).
    w0 = F.try_element_at(doc["weather"], F.lit(1))
    main = doc["main"]
    out = fetch_df.select(
        *_audit_cols(stamp_date, stamp_time),
        F.col("geo_name"),
        coord_string(F.col("lat"), F.col("lon")).alias("original_coordinates"),
        doc["sys"]["country"].alias("country"),
        doc["name"].alias("city_area_name"),
        w0["main"].alias("weather_main"),
        w0["description"].alias("weather_description"),
        kelvin_to_celsius(main["temp"]).alias("temperature"),
        kelvin_to_celsius(main["feels_like"]).alias("feels_like"),
        kelvin_to_celsius(main["temp_min"]).alias("temp_min"),
        kelvin_to_celsius(main["temp_max"]).alias("temp_max"),
        main["pressure"].alias("pressure"),
        main["humidity"].alias("humidity_percent"),
        doc["visibility"].alias("visibility"),
        doc["wind"]["speed"].alias("wind_speed"),
        doc["wind"]["deg"].alias("wind_direction_degrees"),
        doc["clouds"]["all"].alias("cloudiness_percent"),
    )
    return out.filter(_all_present(_WEATHER_REQUIRED)).select(
        *[F.col(f.name).cast(f.dataType) for f in WEATHER_SCHEMA.fields]
    )


def split_errors(fetch_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """O2/F1/F2: split fetch results into (ok, errored) channels.

    The reference gates on status_code == 200 (deployment_function.py:82-88)
    and drops None/empty frames (:212-214) while logging; here failed rows
    are preserved in a side channel so a job can audit them without dying.
    """
    ok = fetch_df.filter(
        (F.col("error").isNull()) & (F.col("status_code") == 200)
    )
    bad = fetch_df.filter(
        (F.col("error").isNotNull()) | (F.col("status_code") != 200)
    )
    return ok, bad


__all__ = ["flatten_traffic", "flatten_weather", "split_errors", "compose_event_ts"]
