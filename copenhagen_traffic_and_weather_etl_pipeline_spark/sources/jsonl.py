"""JSONL (newline-delimited JSON) source and sharded sink.

Training-data pipelines exchange corpora as JSONL shards (one document
per line, fixed shard count, deterministic shard assignment so
downstream jobs can re-find a document without a lookup table). The
reference exchanges raw API JSON (deployment_function.py fetch loop);
this module is the bulk-corpus counterpart:

- :func:`read_jsonl` — schema-projected read with a corrupt-record
  channel: malformed lines land in a quarantine DataFrame instead of
  failing the job (same error-channel contract as
  ``operators.flatten.split_errors``).
- :func:`write_jsonl_sharded` — hash-sharded JSONL export with a
  deterministic ``shard = xxhash64(key) % n`` assignment and a
  row-count manifest. At 100 TB the shard column doubles as the
  partition directory, so a consumer reading shard 17 touches 1/n of
  the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with a quarantine channel: returns ``(ok, bad)``.

    ``ok`` carries rows matching ``schema``; ``bad`` carries the raw
    text of lines that failed to parse. PERMISSIVE mode with an
    explicit corrupt-record column — the whole-job-fails alternative
    (FAILFAST) is wrong for a 100 TB corpus where a handful of
    truncated lines per shard is normal. The input is cached before
    splitting because Spark disallows queries that project only the
    internal corrupt column from a lazily re-parsed source.

    Caching contract: both returned frames share one cached parent
    that stays pinned (memory-and-disk, evictable under pressure)
    until released. Once the ok/bad split has been materialized, call
    ``unpersist_jsonl(ok)`` (or ``bad``) to free it — repeated corpus
    reads in one long-lived session otherwise accumulate cached
    partitions.
    """
    # Copy the schema: StructType.add mutates in place, and silently
    # growing the CALLER's schema by a _corrupt_record field (twice on
    # a second call) is a nasty aliasing bug.
    from pyspark.sql.types import StructField

    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    ok = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    # Pin the cached parent on both children so unpersist_jsonl can
    # release exactly this read (not the whole session cache).
    ok._jsonl_cached_parent = raw
    bad._jsonl_cached_parent = raw
    return ok, bad


def unpersist_jsonl(frame: DataFrame) -> None:
    """Release the cached parent behind a frame returned by
    :func:`read_jsonl`. Safe to call once per read (ok and bad share
    the same cached parent); other cached relations in the session are
    untouched. No-op on frames that did not come from read_jsonl."""
    parent = getattr(frame, "_jsonl_cached_parent", None)
    if parent is not None:
        parent.unpersist()


def write_jsonl_sharded(
    df: DataFrame, path: str, n_shards: int, key: str, verify: bool = False
) -> DataFrame:
    """Export ``df`` as ``n_shards`` JSONL shard directories with
    deterministic assignment ``shard = pmod(xxhash64(key), n_shards)``;
    returns the per-shard row-count manifest.

    The manifest always has exactly ``n_shards`` rows: the sharded
    input is persisted across the write and the count aggregation (one
    materialization feeds both, so a non-deterministic upstream plan
    cannot make the manifest disagree with the files written, and there
    is no second full read of the export), then left-joined against
    ``spark.range(n_shards)`` so shards that received zero rows appear
    with ``n_rows = 0`` — a consumer iterating ``shard=K/`` directories
    must treat a manifest row with 0 rows as "no directory written"
    (partitioned writes emit no directory for empty groups).

    Because the manifest comes from the persisted in-memory frame, it
    does NOT by itself prove the files landed intact. Pass
    ``verify=True`` to re-read the export and cross-check per-shard
    counts against the manifest (raises ``ValueError`` on any
    mismatch) — that costs a second full scan of the export, which is
    why it is opt-in rather than the default.

    The shard column is a physical partition directory: a consumer can
    list ``shard=K/`` and touch exactly 1/n of the corpus, and the same
    key always lands in the same shard across exports — the contract
    resharding-free incremental consumers rely on.
    """
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_shards))
    ).persist()
    try:
        sharded.write.partitionBy("shard").mode("overwrite").json(path)
        # n_shards rows; eagerly materialized so unpersist below cannot
        # trigger a recomputation when the caller reads the manifest.
        counts = (
            sharded.groupBy("shard")
            .agg(F.count("*").alias("n_rows"))
            .localCheckpoint(eager=True)
        )
    finally:
        sharded.unpersist()
    spark = df.sparkSession
    spine = spark.range(n_shards).select(F.col("id").alias("shard"))
    manifest = (
        spine.join(counts, "shard", "left")
        .select("shard", F.coalesce("n_rows", F.lit(0)).alias("n_rows"))
        .orderBy("shard")
    )
    if verify:
        verify_jsonl_manifest(spark, path, manifest)
    return manifest


def verify_jsonl_manifest(spark, path: str, manifest: DataFrame) -> None:
    """Cross-check a :func:`write_jsonl_sharded` manifest against the
    files actually on disk at ``path`` (one full re-read); raises
    ``ValueError`` on the first per-shard count mismatch. Also usable
    standalone to audit an old export against its saved manifest."""
    reread = {
        r["shard"]: r["n"]
        for r in spark.read.json(path)
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for row in manifest.collect():
        if reread.get(row["shard"], 0) != row["n_rows"]:
            raise ValueError(
                f"shard {row['shard']}: manifest says {row['n_rows']} "
                f"rows but the written files contain "
                f"{reread.get(row['shard'], 0)}"
            )
