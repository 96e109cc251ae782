"""Config/secrets source (S4/J3) and run-trigger metadata (S8)."""

from __future__ import annotations

import base64
from datetime import datetime
from zoneinfo import ZoneInfo

from copenhagen_traffic_and_weather_etl_pipeline_spark.config import (
    api_keys,
    get_secret,
    parse_secret,
    run_context,
)


def test_parse_secret_json_or_string():
    assert parse_secret('{"key": "abc123"}') == {"key": "abc123"}
    assert parse_secret("plain-token") == "plain-token"
    # JSON that isn't an object falls back to the raw string, like the
    # reference's dict-or-string contract.
    assert parse_secret("[1, 2]") == "[1, 2]"


def test_get_secret_env_and_conf(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SECRET_TOMTOM_KEY", "env-token")
    assert get_secret("tomtom_key") == "env-token"
    monkeypatch.delenv("SPARK_GRAFT_SECRET_TOMTOM_KEY")
    assert get_secret("tomtom_key") is None

    spark.conf.set("spark.cph_etl.secret.weather_key", '{"key": "conf-token"}')
    try:
        assert get_secret("weather_key", spark) == {"key": "conf-token"}
    finally:
        spark.conf.unset("spark.cph_etl.secret.weather_key")


def test_api_keys_resolution(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SECRET_TOMTOM_KEY", '{"key": "tt"}')
    monkeypatch.setenv("SPARK_GRAFT_SECRET_WEATHER_KEY", "ow")
    assert api_keys() == {"traffic": "tt", "weather": "ow"}
    monkeypatch.delenv("SPARK_GRAFT_SECRET_TOMTOM_KEY")
    monkeypatch.delenv("SPARK_GRAFT_SECRET_WEATHER_KEY")
    assert api_keys() == {"traffic": "test", "weather": "test"}


def test_run_context_stamps_and_trigger_decode():
    fixed = datetime(2026, 8, 12, 14, 30, tzinfo=ZoneInfo("Europe/Copenhagen"))
    payload = base64.b64encode(b"hourly-tick").decode()
    ctx = run_context(trigger_payload_b64=payload, now=fixed)
    assert ctx.run_date == "2026-08-12"
    assert ctx.run_time == "14:30"
    assert ctx.trigger_message == "hourly-tick"
    assert run_context(now=fixed).trigger_message is None
