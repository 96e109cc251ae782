"""Pins for the cross-engine determinism rules (SCALING.md, round 6).

The correctness gate compares Spark against DuckDB value-for-value;
these tests pin the three mechanisms that keep that comparison stable
on ANY data, so a refactor can't silently reintroduce a divergence
class that only fires on unlucky values:

1. byte-based levenshtein (DuckDB counts UTF-8 bytes, Spark counts
   codepoints — the ISO-8859-1 re-read makes Spark count bytes);
2. micro-unit BIGINT aggregation (exact, order-free sums — identical
   across partition counts, which plain double sums are not);
3. IEEE -0.0 normalization (`x + 0.0`) and try_divide NULL semantics
   for degenerate rows.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize(
    "a,b",
    [("på", "pa"), ("würde", "wurde"), ("être", "etre"), ("kitten", "sitting")],
)
def test_levenshtein_byte_trick_matches_duckdb(spark, a, b):
    want = duckdb.sql(f"SELECT levenshtein('{a}', '{b}')").fetchone()[0]

    def bytesafe(c):
        return F.decode(F.encode(c, "UTF-8"), "ISO-8859-1")

    got = (
        spark.createDataFrame([(a, b)], "a string, b string")
        .select(F.levenshtein(bytesafe("a"), bytesafe("b")).alias("d"))
        .first()["d"]
    )
    assert got == want


def test_micro_unit_sum_is_partition_order_invariant(spark):
    """The exact-integer form must give IDENTICAL results at any
    parallelism; the double form it replaced is only ulp-close."""
    vals = [(i, 280.0 + (i % 7) * 0.123) for i in range(5000)]
    df = spark.createDataFrame(vals, "id long, value double")
    mic = F.round(F.col("value") * 1000000).cast("long")

    def agg(parts):
        row = (
            df.repartition(parts)
            .agg(
                F.sum(mic).alias("s"),
                F.expr("sum(cast(round(value * 1000000) as bigint))"
                       " div count(*)").alias("a"),
            )
            .first()
        )
        return row["s"], row["a"]

    assert agg(1) == agg(7) == agg(32)
    # and it matches DuckDB's exact integer arithmetic
    want = duckdb.sql(
        "SELECT CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS BIGINT), "
        "CAST(sum(CAST(round(v * 1000000) AS BIGINT)) // count(*) AS BIGINT) "
        "FROM (SELECT 280.0 + (range % 7) * 0.123 AS v FROM range(5000))"
    ).fetchone()
    assert agg(1) == want


def test_signed_zero_normalization(spark):
    # DuckDB's round keeps the sign of a tiny negative; + 0.0 erases it
    duck = duckdb.sql(
        "SELECT round(-1e-9, 4), round(-1e-9, 4) + 0.0"
    ).fetchone()
    assert str(duck[0]) == "-0.0" and str(duck[1]) == "0.0"
    # Spark's BigDecimal round never produces -0.0; + 0.0 is an exact
    # no-op there, so the normalized forms agree
    row = (
        spark.range(1)
        .select(
            F.round(F.lit(-1e-9), 4).alias("r"),
            (F.round(F.lit(-1e-9), 4) + F.lit(0.0)).alias("n"),
        )
        .first()
    )
    assert str(row["r"]) == "0.0" and str(row["n"]) == "0.0"
    assert str(row["n"]) == str(duck[1])


def test_case_mapping_premap_matches_duckdb_lower(spark):
    """Java toLowerCase applies FULL case mappings ('İ' -> 'i'+U+0307,
    context-sensitive Greek final sigma); DuckDB's utf8proc maps 1:1.
    The İ/Σ pre-map (used by _lev_blocked / text_fingerprint /
    text_normalize's strip-first ordering) makes lower() agree."""
    texts = ["İstanbul DİYARBAKIR", "ΣΟΦΟΣ Σ end", "plain ASCII Text"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    pre = F.regexp_replace(
        F.regexp_replace(F.col("text"), "İ", "i"), "Σ", "σ"
    )
    got = [r["n"] for r in df.select(F.lower(pre).alias("n")).collect()]
    want = [
        duckdb.sql(
            "SELECT lower(replace(replace(?, 'İ', 'i'), 'Σ', 'σ'))",
            params=[t],
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want
    # and the UNMAPPED forms really do diverge — the pre-map is load-bearing
    raw = [r["n"] for r in df.select(F.lower("text").alias("n")).collect()]
    raw_duck = [duckdb.sql("SELECT lower(?)", params=[t]).fetchone()[0]
                for t in texts]
    assert raw != raw_duck


def test_try_divide_matches_duckdb_divide_by_zero(spark):
    # DuckDB: x / 0 is NULL; Spark under ANSI raises unless try_divide
    assert duckdb.sql("SELECT 1.0 / 0").fetchone()[0] is None
    got = (
        spark.range(1)
        .select(F.try_divide(F.lit(1.0), F.lit(0.0)).alias("q"))
        .first()["q"]
    )
    assert got is None
