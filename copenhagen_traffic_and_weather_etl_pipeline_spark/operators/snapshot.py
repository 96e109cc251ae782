"""The flagship snapshot query (bigquery_scheduled_query.sql:1-17):

    SELECT * FROM traffic INNER JOIN weather
    USING (date, time, geo_name, original_coordinates)
    WHERE DATETIME(PARSE_DATE(date), PARSE_TIME(time)) =
          (SELECT MAX(...) FROM traffic)

Covers J1 (multi-key USING inner join), J2 (uncorrelated scalar
subquery), F0 (latest-snapshot filter), A1 (global MAX), D1-D3 (date/time
parse + compose).

Scale notes (100 TB): the scalar-subquery MAX is a partial+final agg over
one column — cheap. The USING join shuffles both sides on the 4-key tuple;
with date-partitioned tables the latest-snapshot filter prunes to a single
partition *before* the join when pushed below it (``latest_snapshot_join``
filters each side first — semantically identical because the filter is on
join keys, and it turns a full-table shuffle into a ≤1-partition one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions import compose_event_ts
from ..schemas import JOIN_KEYS


def using_join(
    left: DataFrame, right: DataFrame, keys: list[str] | None = None, how: str = "inner"
) -> DataFrame:
    """J1: SQL USING-join semantics — list-form ``on`` coalesces the key
    columns into single outputs, exactly like BigQuery's USING
    (bigquery_scheduled_query.sql:6)."""
    return left.join(right, on=keys or JOIN_KEYS, how=how)


def latest_event_ts(df: DataFrame) -> DataFrame:
    """J2+A1: the uncorrelated scalar subquery
    ``SELECT MAX(DATETIME(PARSE_DATE(date), PARSE_TIME(time)))`` as a
    1-row DataFrame (partial+final max agg, no shuffle of data rows)."""
    return df.select(
        F.max(compose_event_ts("date", "time")).alias("max_event_ts")
    )


def latest_snapshot_join(
    traffic: DataFrame, weather: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """The full flagship query, filter pushed BELOW the join.

    The reference filters after the join; because the predicate only
    touches join keys (date, time), filtering both inputs first is
    semantically identical and cuts the join input from full-table to
    one snapshot — the difference between shuffling 100 TB and
    shuffling one hour's partition. The max is computed once and
    broadcast as a literal via a cross-join of the 1-row aggregate
    (Catalyst plans it as BroadcastNestedLoopJoin over 1 row).
    """
    keys = keys or JOIN_KEYS
    max_ts = latest_event_ts(traffic)
    ts = compose_event_ts("date", "time")
    t = traffic.crossJoin(F.broadcast(max_ts)).filter(
        ts == F.col("max_event_ts")
    ).drop("max_event_ts")
    # Weather side: same key-only predicate (inner join makes this safe).
    w = weather.crossJoin(F.broadcast(max_ts)).filter(
        ts == F.col("max_event_ts")
    ).drop("max_event_ts")
    return using_join(t, w, keys)


def refresh_snapshot_pruned(
    spark, traffic_path: str, weather_path: str, keys: list[str] | None = None
) -> DataFrame:
    """Incremental snapshot refresh over date-partitioned fact tables
    (SURVEY §6): resolve the newest date from the partition column (a
    metadata-scale job — the scan reads no data columns), then run the
    flagship join on ONLY that partition of each side.

    The one-value ``first()`` is a planning-time literal fetch, not a
    data collect: it's what makes the subsequent filters *static*
    partition pruning (PartitionFilters at the scan) instead of a
    full-history read. At 100 TB this is the difference between touching
    one day's directory and every directory ever written.
    """
    latest = (
        spark.read.parquet(traffic_path).agg(F.max("date").alias("d")).first()["d"]
    )
    t = spark.read.parquet(traffic_path).filter(F.col("date") == latest)
    w = spark.read.parquet(weather_path).filter(F.col("date") == latest)
    return latest_snapshot_join(t, w, keys)


def latest_snapshot_join_faithful(
    traffic: DataFrame, weather: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Literal operator order of bigquery_scheduled_query.sql: join first,
    filter after. Kept for parity testing; same result set."""
    joined = using_join(traffic, weather, keys or JOIN_KEYS)
    max_ts = latest_event_ts(traffic)
    return (
        joined.crossJoin(F.broadcast(max_ts))
        .filter(compose_event_ts("date", "time") == F.col("max_event_ts"))
        .drop("max_event_ts")
    )


def latest_snapshot_rows(df: DataFrame, order_col: str = "event_ts") -> DataFrame:
    """F0 alternative: all rows carrying the global max of ``order_col``
    (the dense_rank()==1-over-desc semantics), computed scale-safe.

    A global ``Window.orderBy(desc)`` funnels the whole table through one
    task, so instead the max is a partial+final agg (one row) broadcast
    back as a filter literal — identical result, fully parallel at any
    scale.
    """
    mx = df.agg(F.max(order_col).alias("_max_v"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(F.col(order_col) == F.col("_max_v"))
        .drop("_max_v")
    )


def latest_per_key(df: DataFrame, key_cols: list[str], order_col: str, tiebreak: str | None = None) -> DataFrame:
    """Latest-row-per-key via row_number window — the scalable version of
    the snapshot pattern when 'latest' is per entity rather than global."""
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = W.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
