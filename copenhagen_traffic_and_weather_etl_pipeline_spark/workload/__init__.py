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
# the back. Rounds 2–4 proved 146/171 (r2: 48, r3: 48/50, r4: 50/50).
# Round 5's window below holds the final 25 still-unproven entries
# (round 4's planned _NEXT_WINDOW, executed) — a green round takes the
# driver-proven union to 171/171. Slots 26–50 re-confirm the 25 most
# important already-proven queries under the current code: the 20
# bench-headline queries plus the flagship SQL family and
# triangle_count_coorder (whose close helpers are shared with the
# rewritten triangle_count_doulion this round) — their standing
# evidence dates to rounds 1–2, the oldest in the ledger.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW = [
    # -- the 25 entries without a driver row yet (round-4 _NEXT_WINDOW) --
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
    # -- re-confirmation fill: oldest-evidence headline/flagship set --
    "flagship_latest_snapshot",
    "using_join_enriched",
    "pricing_summary",
    "outer_join_order_counts",
    "latest_per_key",
    "hourly_tumbling",
    "above_customer_avg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_topk_bruteforce",
    "sim_ann_lsh_buckets",
    "ivf_ann_search",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "tfidf_top_terms",
    "window_running_total",
    "sessionize_events",
    "cube_revenue",
    "triangle_count_coorder",
    "json_extract",
    "scalar_subquery_latest",
    "dedup_prefix_filter_jaccard",
    "variant_open_schema_agg",
]

# All 171 entries will then carry a driver row; no further rotation is
# queued — keep _NEXT_WINDOW empty unless a future round changes query
# semantics and needs a re-proof slot.
_NEXT_WINDOW: list[str] = []


def _rotate_registry() -> None:
    ordered = {name: REGISTRY[name] for name in _DRIVER_WINDOW + _NEXT_WINDOW}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_registry()

__all__ = ["REGISTRY", "QuerySpec", "register", "load", "register_views", "TABLES"]
