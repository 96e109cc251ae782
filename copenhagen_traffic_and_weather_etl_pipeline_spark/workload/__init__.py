"""Workload registry: every operator from SURVEY.md §2 (plus the
large-scale extension operators) exposed as a named query with a
matching DuckDB oracle for the driver's correctness gate.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` and, where
SQL-expressible, an ANSI-SQL string DuckDB runs over the same parquet
tables. Column names are aliased identically on both sides (the driver
sorts columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: list[str] | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, tags or [])
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md).

    ``events.parquet`` stores ``ts`` as parquet INT64 TIMESTAMP(NANOS),
    which Spark 4.x rejects at scan time (PARQUET_TYPE_ILLEGAL). Read it
    as a raw long and truncate to microseconds with integer division —
    ``ts div 1000`` (never float ``/1000``: ~1.7e18 nanos exceeds double
    mantissa precision). Oracles must truncate identically via
    ``CAST(ts AS TIMESTAMP)`` (DuckDB TIMESTAMP_NS -> micros).
    """
    if table == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(f"{sf_dir}/{table}.parquet").withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so the full surface
    is reachable from plain ``spark.sql`` — the interface the reference's
    consumers already speak (its one real query is a BigQuery scheduled
    SQL statement, 2_featured_tables_creation.sql). Views are lazy: no
    scan happens until a query touches one."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# Importing the modules populates REGISTRY.
from . import reference_queries  # noqa: E402,F401
from . import extension_queries  # noqa: E402,F401
from . import scale_queries  # noqa: E402,F401
from . import training_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register", "load", "register_views", "TABLES"]
