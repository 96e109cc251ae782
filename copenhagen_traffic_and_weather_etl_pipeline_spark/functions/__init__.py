"""Scalar function library — the reference's scalar surface re-expressed
with built-in ``pyspark.sql.functions`` (JVM-side, codegen'd; zero Python
UDFs).

Reference parity map (SURVEY.md §2.6):
- D1 PARSE_DATE('%Y-%m-%d', date)    -> :func:`parse_date_col`
- D2/D3 PARSE_TIME + DATETIME(d, t)  -> :func:`compose_event_ts`
  (Spark has no TIME type, so date+time compose directly to a timestamp,
  which is the only thing the reference ever does with the parsed TIME:
  bigquery_scheduled_query.sql:8-15)
- D4 strftime date/time stamping      -> :func:`stamp_audit_columns`
- M1 Kelvin→Celsius (x - 273.15)      -> :func:`kelvin_to_celsius`
- T1/T2 "lat,lon" concat + str cast   -> :func:`coord_string`
- T3 base64 payload decode            -> :func:`decode_pubsub_payload`
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DATE_FMT = "yyyy-MM-dd"  # reference '%Y-%m-%d' (deployment_function.py:62)
TIME_FMT = "HH:mm"  # reference '%H:%M'    (deployment_function.py:63)
KELVIN_OFFSET = 273.15  # deployment_function.py:140-143


def parse_date_col(date: Column | str) -> Column:
    """D1: PARSE_DATE('%Y-%m-%d', date) (bigquery_scheduled_query.sql:9)."""
    return F.to_date(F.col(date) if isinstance(date, str) else date, DATE_FMT)


def compose_event_ts(date: Column | str, time: Column | str) -> Column:
    """D2+D3: DATETIME(PARSE_DATE(date), PARSE_TIME(time)) -> timestamp.

    bigquery_scheduled_query.sql:8-11. Composed as one to_timestamp over
    the concatenated strings so Spark and the SQL oracle share identical
    semantics (and Catalyst folds it into a single codegen'd expression).
    """
    d = F.col(date) if isinstance(date, str) else date
    t = F.col(time) if isinstance(time, str) else time
    return F.to_timestamp(F.concat_ws(" ", d, t), f"{DATE_FMT} {TIME_FMT}")


def stamp_audit_columns(ts: Column | None = None) -> dict[str, Column]:
    """D4/D5/P8: the run-time ``date``/``time`` string stamps every ingested
    row carries (deployment_function.py:61-63). Pass an event-time column
    to stamp event time instead of wall clock (better for late data)."""
    ts = F.current_timestamp() if ts is None else ts
    return {
        "date": F.date_format(ts, DATE_FMT),
        "time": F.date_format(ts, TIME_FMT),
    }


def kelvin_to_celsius(col: Column | str) -> Column:
    """M1/P5: x - 273.15 (deployment_function.py:140-143). Same literal
    arithmetic as the reference so results match bit-for-bit."""
    c = F.col(col) if isinstance(col, str) else col
    return c - F.lit(KELVIN_OFFSET)


def coord_string(lat: Column | str, lon: Column | str) -> Column:
    """T1/T2/P6/P7: str(lat) + ',' + str(lon) (deployment_function.py:119-121).
    Numeric inputs are cast to string inside the concat. Uses null-propagating
    ``concat`` (not ``concat_ws``, which skips nulls): a missing coordinate
    must surface as NULL so the flatten null-gate drops the row, matching the
    reference's KeyError-drop (deployment_function.py:123-125)."""
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    return F.concat(la.cast("string"), F.lit(","), lo.cast("string"))


def decode_pubsub_payload(col: Column | str) -> Column:
    """T3: base64-decode of the trigger payload (deployment_function.py:18)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unbase64(c).cast("string")
