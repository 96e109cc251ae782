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


def _resolve_sf_dir(sf_dir: str, table: str) -> str:
    """Trust-but-verify the data dir the caller handed us.

    The driver passes absolute `/root/testdata/sfX` paths, which can be
    wiped mid-round (observed round 6: every query died at the scan and
    the whole round's artifacts were void). The fallback decision is
    DIRECTORY-level, via the same sentinel the resolver uses (the
    biggest table): only a dir missing `lineitem.parquet` re-resolves
    through `testdata.sf_dir`, and then EVERY table of the query reads
    from the replica. A partially populated dir (mid-write) keeps the
    given path even for a missing table — erroring loudly beats
    silently joining driver orders against replica lineitem, whose keys
    don't correspond. Byte-identical behavior whenever the given path
    is populated.
    """
    import os

    from ..testdata import _SENTINEL

    if os.path.exists(os.path.join(sf_dir, _SENTINEL)):
        return sf_dir
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            float(base[2:])
        except ValueError:
            # Not an sf-suffixed driver path (e.g. an ad-hoc test dir
            # that merely starts with "sf") — nothing to re-resolve.
            return sf_dir
        from ..testdata import sf_dir as _fallback

        resolved = _fallback(base[2:])
        if os.path.exists(f"{resolved}/{table}.parquet"):
            return resolved
    return sf_dir


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
    sf_dir = _resolve_sf_dir(sf_dir, table)
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
from . import streaming_replay_queries  # noqa: E402,F401
from . import decorrelation_queries  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window rotation. The correctness driver checks the FIRST 50
# registry entries in insertion order per round, so each round the 50
# slots go first to queries without a green CORRECTNESS row, then to
# queries whose DEFINITION changed after their newest green row, then to
# the ones whose standing evidence is oldest. Rounds 2-5 proved the full
# 171-entry union; round 6's driver gate was void-environmental (wiped
# /root/testdata), so nothing was re-proven then.
# Round 7's window: the 4 entries added in round 6 (never driver-proven),
# then the 40 entries whose (function source + oracle) hash differs from
# the last tree a driver gate actually ran on (f0491d0, the round-5
# state) -- the rounds-6/7 micro-unit determinism sweeps, the ANN
# retrain (ivf/pq/lsh), the NULL-aware means, and the rational-tie
# rounding fixes -- computed by hashing inspect.getsource(fn) + oracle
# at both revisions, not guessed from diffs. The remaining 6 slots take
# the stalest r2-era proofs.
# Late-round amendment: asof_join_last_purchase (operator-level ASOF
# NULL-payload semantic fix in operators/temporal.py — caught by the
# NULL-boosted gate, invisible to the fn+oracle hash) and
# mm_binary_meta (multimodal NULL-text filter) replace the two least
# at-risk unchanged entries (global_max_agg, date_roundtrip).
# Second amendment (degenboost zero-norm cosine hardening): of the 9
# cosine-site definitions changed, ivf_ann_search /
# dedup_semantic_kmeans / embedding_centroid_outliers were already in
# the window; sim_topk_vectorized, sim_topk_bruteforce,
# ann_recall_eval, knn_join_lsh (UDF control flow / new pre-rank
# filters — the largest behavioral surface) take the last 4 slots from
# the stale-but-unchanged r2 quartet; dedup_embedding_{cosine,lsh}
# (expression-only change, NULLs already dropped by the >= threshold)
# head _NEXT_WINDOW.
# Third amendment (eraboost): daily_counts_gapfilled's spine semantics
# changed outright (31-day gap cap replaces the min/max calendar), so
# it replaces mutual_information_event_value (a -0.0-normalization-
# class change, pinned by unit test and validated on 10 datasets —
# the lowest-risk changed entry in the window).
# ---------------------------------------------------------------------------

_DRIVER_WINDOW = [
    "sessionize_stream_replay",
    "stream_join_replay",
    "small_qty_revenue_q17",
    "top_supplier_share_q20",
    "text_fingerprint",
    "mm_magic_sniff",
    "mm_binary_dedup",
    "mm_frame_sample",
    "range_join_value_bands",
    "dedup_levenshtein",
    "mm_byte_features",
    "grouping_sets_revenue",
    "conditional_agg_priorities",
    "regexp_extract_types",
    "stats_moments_orders",
    "dedup_prefix_filter_jaccard",
    "sliding_window_counts",
    "tfidf_top_terms",
    "ivf_ann_search",
    "kmeans_clusters",
    "zscore_by_user",
    "corr_value_props",
    "profile_customer",
    "variant_open_schema_agg",
    "pricing_summary",
    "hourly_tumbling",
    "above_customer_avg",
    "text_quality",
    "mm_image_decode",
    "embedding_centroid_outliers",
    "bm25_retrieval",
    "window_moving_avg",
    "text_normalize",
    "dedup_semantic_kmeans",
    "chunk_documents_overlap",
    "trend_regression_events",
    "winsorize_values",
    "interpolate_hourly_values",
    "text_entropy",
    "pq_ann_adc",
    "curriculum_buckets",
    "time_rollup_multigrain",
    "revenue_mom_growth",
    "daily_counts_gapfilled",
    "asof_join_last_purchase",
    "mm_binary_meta",
    "sim_topk_vectorized",
    "sim_topk_bruteforce",
    "ann_recall_eval",
    "knn_join_lsh",
]

# Positions 51+: definition-unchanged entries in staleness order (the
# r2/r3-era proofs displaced by round 7's definition-changed set), so
# the round-8 rotation is again a window swap rather than a reshuffle.
# anti_join_customers heads the list: its definition changed late in
# round 7 (filtered right side so the result is non-empty on the
# returned 2026-08-15 driver data), but the change is the lowest-risk
# class in the repo — integer/string output, no float surface, locally
# gate-verified on both data generations — so it yields its window
# claim to the higher-risk changed entries already in slots 5-50.
_NEXT_WINDOW: list[str] = [
    "anti_join_customers",
    "mutual_information_event_value",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "kelvin_to_celsius",
    "coord_concat",
    "json_typed_agg",
    "array_first_last",
    "global_max_agg",
    "date_roundtrip",
    "top_orders",
    "semi_join_customers",
    "set_except_status",
    "set_intersect_status",
    "rollup_lineitem",
    "pivot_event_counts",
    "distinct_flags",
    "dedup_resolve_clusters",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "text_pii_scrub",
    "text_strip_hotwords",
    "dedup_incremental",
    "text_token_encode",
    "dedup_method_eval",
    "window_lead_lag",
    "stratified_sample",
    "salted_group_count",
    "salted_join_segments",
    "percentile_prices",
    "approx_distinct_users",
    "window_rank_suite",
    "unpivot_lineitem_metrics",
    "pack_sequences",
    "shuffle_shards_deterministic",
    "decontaminate_ngram_overlap",
    "text_repetition_quality",
    "split_train_val_test",
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
