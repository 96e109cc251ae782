from __future__ import annotations

import pytest

from copenhagen_traffic_and_weather_etl_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s
