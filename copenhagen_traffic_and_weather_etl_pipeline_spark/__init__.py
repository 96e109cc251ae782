"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline
(allanreda/Copenhagen-Traffic-and-Weather-ETL-Pipeline).

The reference is an hourly batch ETL: fetch traffic + weather JSON for 20
Copenhagen geo-points, flatten to typed rows, append to two fact tables,
then join + latest-snapshot filter into a materialized `latest_joined_data`
table (reference: deployment_function.py, bigquery_scheduled_query.sql).

This package re-expresses every operator Spark-first:

- ``schemas``    — explicit StructTypes mirroring the reference DDL
- ``sources``    — REST-source abstraction + JSON flattening inputs
- ``operators``  — flatten, snapshot join, dedup, similarity, text analysis
- ``functions``  — scalar function library (date compose, K→°C, coords)
- ``plans``      — pipeline composition + per-row fault isolation
- ``streaming``  — Structured Streaming variant of the hourly pipeline
- ``sinks``      — append / overwrite table sinks
- ``config``     — secrets source (env/spark.conf) + run-trigger metadata

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection and AQE; Python UDFs are avoided in hot paths.
"""

__version__ = "0.1.0"
