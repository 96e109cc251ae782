"""Config / secrets source (SURVEY.md §2.1 S4, §2.6 J3) and trigger
metadata (S8).

The reference reads API keys from GCP Secret Manager with a
JSON-or-plain-string fallback parse (deployment_function.py:23-43: try
``json.loads``, fall back to the raw string) and is triggered by a
Pub/Sub CloudEvent whose payload it base64-decodes and logs
(deployment_function.py:15-18). Neither is a relational operator, so the
engine keeps them in a thin config layer: secrets come from environment
variables or ``spark.conf`` (the cluster-native channels a Spark job
actually has), with the same JSON-or-string parse semantics; the trigger
becomes a ``RunContext`` record stamped onto a batch run.

No cloud SDK is imported — a production deployment injects values into
env/conf from whatever secret store it uses (the engine stays
vendor-neutral).
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import dataclass
from datetime import datetime
from zoneinfo import ZoneInfo

from pyspark.sql import SparkSession

# Lookup order: SPARK_GRAFT_SECRET_<ID> env var, then spark.conf key
# ``spark.cph_etl.secret.<id>``.
ENV_PREFIX = "SPARK_GRAFT_SECRET_"
CONF_PREFIX = "spark.cph_etl.secret."

# The reference stamps run time in Copenhagen wall clock
# (deployment_function.py:58-63).
RUN_TZ = "Europe/Copenhagen"


def parse_secret(raw: str) -> dict | str:
    """J3: JSON-or-string fallback parse (deployment_function.py:34-39).
    A JSON payload yields a dict; anything else is returned verbatim."""
    try:
        parsed = json.loads(raw)
    except (json.JSONDecodeError, TypeError):
        return raw
    return parsed if isinstance(parsed, dict) else raw


def get_secret(
    secret_id: str, spark: SparkSession | None = None
) -> dict | str | None:
    """S4: resolve a named secret from env var or spark.conf.

    Returns None (like the reference's error path,
    deployment_function.py:41-43) when the secret is absent — callers
    decide whether that's fatal.
    """
    raw = os.environ.get(f"{ENV_PREFIX}{secret_id.upper()}")
    if raw is None and spark is not None:
        try:
            raw = spark.conf.get(f"{CONF_PREFIX}{secret_id}")
        except Exception:  # noqa: BLE001 - missing conf key
            raw = None
    if raw is None:
        return None
    return parse_secret(raw)


def api_keys(spark: SparkSession | None = None) -> dict[str, str]:
    """The two API keys the fetch stage needs (deployment_function.py:51-53),
    resolved per data_type with a test-safe default."""
    keys: dict[str, str] = {}
    for data_type, secret_id in [("traffic", "tomtom_key"), ("weather", "weather_key")]:
        val = get_secret(secret_id, spark)
        if isinstance(val, dict):
            val = val.get("key")
        keys[data_type] = val if isinstance(val, str) else "test"
    return keys


@dataclass(frozen=True)
class RunContext:
    """S8: one batch run's trigger metadata — the engine-side analogue of
    the Pub/Sub CloudEvent activation (deployment_function.py:15-18)."""

    run_date: str  # '%Y-%m-%d' wall clock in RUN_TZ
    run_time: str  # '%H:%M'
    trigger_message: str | None = None


def run_context(
    trigger_payload_b64: str | None = None, now: datetime | None = None
) -> RunContext:
    """Build the run's audit stamps the way the reference does at module
    init (deployment_function.py:58-63): wall clock in Europe/Copenhagen,
    formatted to the string pair every ingested row carries. The trigger
    payload, if any, is base64-decoded exactly like hello_pubsub."""
    now = now or datetime.now(ZoneInfo(RUN_TZ))
    msg = None
    if trigger_payload_b64 is not None:
        msg = base64.b64decode(trigger_payload_b64).decode("utf-8")
    return RunContext(
        run_date=now.strftime("%Y-%m-%d"),
        run_time=now.strftime("%H:%M"),
        trigger_message=msg,
    )


__all__ = [
    "parse_secret",
    "get_secret",
    "api_keys",
    "RunContext",
    "run_context",
]
