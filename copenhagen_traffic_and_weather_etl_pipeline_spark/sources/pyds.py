"""Spark 4 Python Data Source for the REST fetch stage (SURVEY.md §2.1
S1 option (a)): ``spark.read.format("rest_endpoints")`` scans the
endpoint fan-out as a first-class source, one input partition per
endpoint chunk, fetching inside the executor.

This is the declarative sibling of ``rest.fetch_endpoints`` (the
mapInPandas stage): same fan-out (deployment_function.py:296-307), same
3-try retry (:72), same per-row fault capture, but surfaced through the
DataSource V2 Python API so it composes with ``spark.read`` options,
shows up in the plan as a scan, and partitions explicitly.

The HTTP client is resolved from options (options are strings — a
callable can't cross the serialization boundary):

- ``mode=fixture`` + ``responses=<json>``: canned substring->response
  map, used by every test; never touches the network.
- ``mode=http``: stdlib urllib fetch (import-gated; only for a real
  deployment with real keys).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import FETCH_RESULT_SCHEMA, GEO_POINTS

# Reuse the URL templates and retry policy from the mapInPandas stage so
# the two S1 implementations cannot drift.
from .rest import TRAFFIC_URL, WEATHER_URL, fetch_with_retry, fixture_fetcher

_TEMPLATES = {"traffic": TRAFFIC_URL, "weather": WEATHER_URL}


class _EndpointChunk(InputPartition):
    def __init__(self, rows: Sequence[tuple]):
        self.rows = list(rows)


def _http_fetcher(url: str) -> tuple[int, str]:
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as resp:  # noqa: S310
        return resp.status, resp.read().decode("utf-8")


class RestEndpointsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.data_types = tuple(
            t for t in options.get("data_types", "weather,traffic").split(",") if t
        )
        self.num_partitions = int(options.get("num_partitions", "8"))
        self.tries = int(options.get("tries", "3"))
        self.delay = float(options.get("delay", "0"))

    def _endpoints(self) -> list[tuple]:
        keys = json.loads(self.options.get("api_keys", "{}"))
        return [
            (
                geo_key,
                geo_name,
                lat,
                lon,
                dt,
                _TEMPLATES[dt].format(lat=lat, lon=lon, api_key=keys.get(dt, "test")),
            )
            for geo_key, geo_name, lat, lon in GEO_POINTS
            for dt in self.data_types
        ]

    def partitions(self) -> Sequence[InputPartition]:
        eps = self._endpoints()
        n = max(1, min(self.num_partitions, len(eps)))
        size = -(-len(eps) // n)  # ceil-div: balanced chunks
        return [_EndpointChunk(eps[i : i + size]) for i in range(0, len(eps), size)]

    def read(self, partition: _EndpointChunk) -> Iterator[tuple]:
        mode = self.options.get("mode", "fixture")
        if mode == "fixture":
            responses = {
                frag: (int(s), body)
                for frag, (s, body) in json.loads(
                    self.options.get("responses", "{}")
                ).items()
            }
            fetcher = fixture_fetcher(responses)
        elif mode == "http":
            fetcher = _http_fetcher
        else:
            raise ValueError(f"unknown mode: {mode!r} (use 'fixture' or 'http')")
        for geo_key, geo_name, lat, lon, data_type, url in partition.rows:
            status, payload, err = fetch_with_retry(
                fetcher, url, tries=self.tries, delay=self.delay
            )
            yield (geo_key, geo_name, lat, lon, data_type, status, payload, err)


class RestEndpointsDataSource(DataSource):
    """``spark.dataSource.register(RestEndpointsDataSource)`` then
    ``spark.read.format("rest_endpoints").option(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "rest_endpoints"

    def schema(self):
        return FETCH_RESULT_SCHEMA

    def reader(self, schema) -> RestEndpointsReader:
        return RestEndpointsReader(self.options)


__all__ = ["RestEndpointsDataSource", "RestEndpointsReader"]
