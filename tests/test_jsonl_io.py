"""JSONL source/sink: quarantine-channel reads, deterministic hash
sharding, manifest verification, and cross-export shard stability."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from copenhagen_traffic_and_weather_etl_pipeline_spark.sources import jsonl

from copenhagen_traffic_and_weather_etl_pipeline_spark.testdata import sf_dir

SF_DIR = sf_dir("0.001")

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello", "lang": "en"}',
        "{not json at all",
        '{"doc_id": 2, "text": "verden", "lang": "da"}',
        '"just a string"',
        '{"doc_id": 3, "text": "ok", "lang": "en"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    ok, bad = jsonl.read_jsonl(spark, str(p), DOC_SCHEMA)
    assert ok.count() == 3
    assert sorted(r.doc_id for r in ok.collect()) == [1, 2, 3]
    assert bad.count() == 2
    assert ok.columns == ["doc_id", "text", "lang"]


def test_sharded_export_roundtrip_and_manifest(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n = docs.count()
    out = str(tmp_path / "export")
    manifest = jsonl.write_jsonl_sharded(docs, out, n_shards=4, key="doc_id")
    rows = manifest.collect()
    assert sorted(r.shard for r in rows) == [0, 1, 2, 3]
    assert sum(r.n_rows for r in rows) == n

    back = spark.read.json(out)
    assert back.count() == n
    # Content survives: join back on doc_id and compare text.
    mismatch = (
        back.select("doc_id", F.col("text").alias("t2"))
        .join(docs, "doc_id")
        .filter(F.col("t2") != F.col("text"))
        .count()
    )
    assert mismatch == 0


def test_unpersist_releases_only_this_reads_cache(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "text": "a", "lang": "en"}\n')
    other = spark.range(10).cache()
    other.count()
    ok, bad = jsonl.read_jsonl(spark, str(p), DOC_SCHEMA)
    assert ok.count() == 1 and bad.count() == 0
    jsonl.unpersist_jsonl(ok)
    # The unrelated cached frame must still be cached.
    assert other.storageLevel.useMemory
    other.unpersist()


def test_manifest_includes_zero_row_shards(spark, tmp_path):
    # One row, many shards: every shard must appear in the manifest,
    # the empty ones with n_rows = 0 (a partitioned write emits no
    # directory for them, so a re-read-based manifest would drop them).
    one = spark.createDataFrame([(1, "only")], "doc_id long, text string")
    manifest = jsonl.write_jsonl_sharded(one, str(tmp_path / "e"), 16, "doc_id")
    rows = manifest.collect()
    assert [r.shard for r in rows] == list(range(16))
    assert sum(r.n_rows for r in rows) == 1
    assert sum(1 for r in rows if r.n_rows == 0) == 15


def test_shard_assignment_is_deterministic_across_exports(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    a = jsonl.write_jsonl_sharded(docs, str(tmp_path / "a"), 8, "doc_id")
    b = jsonl.write_jsonl_sharded(docs, str(tmp_path / "b"), 8, "doc_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    ra = spark.read.json(str(tmp_path / "a")).select("doc_id", "shard")
    rb = spark.read.json(str(tmp_path / "b")).select(
        "doc_id", F.col("shard").alias("shard_b")
    )
    moved = ra.join(rb, "doc_id").filter(F.col("shard") != F.col("shard_b")).count()
    assert moved == 0


def test_verify_flag_cross_checks_written_files(spark, tmp_path):
    import shutil

    import pytest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "v")
    # Intact export: verify=True passes and returns the manifest.
    manifest = jsonl.write_jsonl_sharded(docs, out, 4, "doc_id", verify=True)
    assert sum(r.n_rows for r in manifest.collect()) == docs.count()
    # Corrupt the export (drop one shard directory wholesale): the
    # verifying variant must notice the manifest/file mismatch.
    victim = next(p for p in (tmp_path / "v").iterdir() if p.name.startswith("shard="))
    shutil.rmtree(victim)
    with pytest.raises(ValueError, match="manifest says"):
        jsonl.verify_jsonl_manifest(spark, out, manifest)
