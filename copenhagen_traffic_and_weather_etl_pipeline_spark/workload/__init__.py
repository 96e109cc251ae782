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

    ``events.ts`` has shipped in two physical vintages: parquet INT64
    TIMESTAMP(NANOS) (which Spark 4.x rejects at scan time unless read
    as a raw long) and plain TIMESTAMP(MICROS) (surfaced as
    TIMESTAMP_NTZ). Normalize both to session-TZ ``timestamp`` micros:
    the nanos-long vintage truncates with integer division ``ts div
    1000`` (never float ``/1000``: ~1.7e18 nanos exceeds double
    mantissa precision); the NTZ vintage casts directly (session TZ is
    UTC, so wall-clock values are preserved). Oracles truncate
    identically via ``CAST(ts AS TIMESTAMP)``.
    """
    if table == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
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
from . import breadth_queries  # noqa: E402,F401
from . import sketch_queries  # noqa: E402,F401
from . import geo_cdc_queries  # noqa: E402,F401
from . import layout_queries  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window rotation. The correctness driver checks the FIRST 50
# registry entries in insertion order per round, so each round the 50
# slots go to the queries without a green CORRECTNESS row yet; proven
# queries keep their row from the round that checked them and move to
# the back. Round 2 proved 48 queries (CORRECTNESS_r02.json), round 3
# proved 48 more (CORRECTNESS_r03.json, 48/50). Round 4's window below
# holds the two round-3 hash FAILs — re-fixed this round with
# integer-micro-unit / explicit-BIGINT outputs — plus 48 of the 66
# still-unproven entries (ROUND3_NOTES.md "Round-4 rotation plan").
# _NEXT_WINDOW queues the round-5 head: the two entries bumped to make
# room for the re-fixed pair, then the planned round-5 tail.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW = [
    "source_mixture_weights",
    "sample_token_budget",
    "window_moving_avg",
    "window_first_last",
    "percentile_by_priority",
    "hash_sample_orders",
    "set_except_all_keys",
    "text_normalize",
    "histogram_prices",
    "embedding_norm_stats",
    "embedding_centroid_outliers",
    "ann_recall_eval",
    "bm25_retrieval",
    "dedup_semantic_kmeans",
    "approx_quantile_value",
    "decontaminate_bloom",
    "quality_filter_cascade",
    "chunk_documents_overlap",
    "bpe_pair_merges",
    "trend_regression_events",
    "winsorize_values",
    "interpolate_hourly_values",
    "triangle_count_coorder",
    "cohort_retention",
    "ab_test_lift",
    "attribution_first_touch",
    "pmi_token_pairs",
    "funnel_latency_percentiles",
    "time_weighted_avg_value",
    "gaps_islands_activity",
    "exists_over_balance",
    "skyline_orders",
    "text_entropy",
    "map_agg_event_counts",
    "mode_return_priority",
    "web_url_canonicalize",
    "web_domain_caps",
    "web_blocklist_filter",
    "pq_ann_adc",
    "curriculum_buckets",
    "hashed_feature_buckets",
    "dq_expectations",
    "time_rollup_multigrain",
    "running_distinct_users",
    "local_supply_revenue",
    "ship_delay_by_priority",
    "revenue_mom_growth",
    "rolling_7d_active_users",
    "window_distribution_funcs",
    "skew_profile",
]

_NEXT_WINDOW = [
    "incremental_agg_merge",
    "benford_price_digits",
    "k_anonymity_customers",
    "heavy_hitters_tokens",
    "ngram_lm_perplexity",
    "merge_upsert_cdc",
    "assign_contiguous_ids",
    "geo_cell_density",
    "nearest_station_events",
    "snapshot_diff_cdf",
    "zorder_cluster_key",
    "compaction_plan",
    "zonemap_prune_estimate",
    "kmv_set_intersection",
    "kaplan_meier_retention",
    "record_linkage_score",
    "equidepth_histogram",
    "mutual_information_event_value",
    "knn_join_lsh",
    "incremental_join_view",
    "fk_containment_profile",
    "countmin_token_counts",
    "mm_image_decode",
    "dedup_incremental_replay",
    "triangle_count_doulion",
]


def _rotate_registry() -> None:
    ordered = {name: REGISTRY[name] for name in _DRIVER_WINDOW + _NEXT_WINDOW}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_registry()

__all__ = ["REGISTRY", "QuerySpec", "register", "load", "register_views", "TABLES"]
