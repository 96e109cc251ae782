"""Raw-SQL surface: register_views exposes every table to spark.sql, and
a SQL statement matches its DataFrame-API formulation exactly — the
migration path for the reference's BigQuery-SQL consumers."""

from __future__ import annotations

from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import (
    TABLES,
    REGISTRY,
    register_views,
)

from copenhagen_traffic_and_weather_etl_pipeline_spark.testdata import sf_dir

SF_DIR = sf_dir("0.001")


def test_all_tables_visible_to_sql(spark):
    register_views(spark, SF_DIR)
    for t in TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0]["n"] > 0


def test_sql_matches_dataframe_formulation(spark):
    register_views(spark, SF_DIR)
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    assert len(sql_rows) > 0

    from pyspark.sql import functions as F

    df_rows = (
        spark.table("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    )
    assert sql_rows == df_rows


def test_events_view_has_converted_timestamps(spark):
    # The nanos->micros conversion must ride into the view: SQL users get
    # a real TIMESTAMP column, not a raw long.
    register_views(spark, SF_DIR)
    dtype = dict(spark.table("events").dtypes)["ts"]
    assert dtype == "timestamp"
    assert spark.sql("SELECT max(ts) AS m FROM events").collect()[0]["m"] is not None
