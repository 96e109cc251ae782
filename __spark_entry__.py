"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship snapshot query (the reference's
bigquery_scheduled_query.sql re-expressed Spark-first) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the large-scale extension operators, each with a
DuckDB-equivalent oracle (see
copenhagen_traffic_and_weather_etl_pipeline_spark/workload/).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import (  # noqa: E402
    REGISTRY,
)

from copenhagen_traffic_and_weather_etl_pipeline_spark.testdata import (  # noqa: E402
    sf_dir,
)

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001; driver checks rows>0.

    The data dir resolves lazily HERE — driver data (/root/testdata)
    when present, local replica fallback (tools/gen_local_testdata.py)
    otherwise — so merely importing this module never triggers
    multi-second replica generation as an import side effect."""
    return REGISTRY["flagship_latest_snapshot"].fn(spark, sf_dir("0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry."""
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
