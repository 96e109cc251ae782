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


# ---------------------------------------------------------------------------
# Round-7 pins: the rational-tie rounding class (SCALING.md rule 1
# refinement). A mean of 2-dp money is the rational sum_cents/(100*n),
# which lands EXACTLY on a 4-dp rounding midpoint whenever the cent sum
# has the right parity — ~5% of groups, not a rare ulp event (seed-777
# tripped profile_customer this way). On such a tie the engines'
# order-drifted double sums (or, with exact sums, their different
# round algorithms) pick opposite sides. The safe emission is
# round(exact_integer_sum * 10^d/unit / n) / 10^d: one shared double
# division and a SCALE-0 round.
#
# DuckDB probing gotcha pinned here in comments: inline SQL float
# literals parse as DECIMAL first (round(CAST(90.49999999999999 AS
# DOUBLE)) returns 91!), so every cross-engine probe below binds
# parameters — the same code path as reading doubles from parquet.
# ---------------------------------------------------------------------------


def test_scale0_round_agrees_on_midpoint_battery(spark):
    """F.round(x) (scale 0) must equal DuckDB round(x) for every double,
    including exact m.5 midpoints and their +-1ulp neighbours. Scale 0 is
    the ONLY scale with this property: every m.5 is representable, so the
    shortest-repr (Spark BigDecimal) and binary-value (DuckDB) decisions
    coincide. Two-arg round(x, 6) provably diverges (see next test)."""
    import math

    xs = []
    for m in (1, 2, 3, 4, 16, 90, 91, 127, 499, 2000):
        v = m + 0.5
        xs += [v, math.nextafter(v, 0), math.nextafter(v, 1e12)]
    got = [
        float(r["r"])
        for r in spark.createDataFrame([(x,) for x in xs], "x double")
        .select(F.round("x").alias("r"))
        .collect()
    ]
    want = [
        float(duckdb.sql("SELECT round(?)", params=[x]).fetchone()[0])
        for x in xs
    ]
    assert got == want


def test_two_arg_round_diverges_on_shortest_repr_ties(spark):
    """The divergence that motivates scale-0: the double nearest
    4.0000005 sits BELOW the true midpoint in binary, but its shortest
    decimal representation IS '4.0000005' — Spark's BigDecimal HALF_UP
    rounds it UP to 4.000001 while DuckDB's multiply-then-round sees the
    binary value and rounds DOWN to 4.0. (If a future engine version
    makes these agree, the scale-0 rule is merely redundant, not wrong —
    relax this pin rather than reintroducing two-arg rounds.)"""
    x = 4.0000005
    sp = (
        spark.createDataFrame([(x,)], "x double")
        .select(F.round("x", 6).alias("r"))
        .first()["r"]
    )
    du = duckdb.sql("SELECT round(?, 6)", params=[x]).fetchone()[0]
    assert sp == 4.000001 and du == 4.0


def test_money_mean_rational_tie_matches_duckdb(spark):
    """199 prices of 1.00 + one 1.01 -> mean is EXACTLY the 4-dp
    midpoint 1.00005 (cent sum 20001 is odd, n = 200). The micro-unit
    pattern must emit the identical half-away result on both engines."""
    vals = [1.00] * 199 + [1.01]
    df = spark.createDataFrame([(v,) for v in vals], "p double")
    got = df.agg(
        (
            F.round(
                F.sum(F.round(F.col("p") * 100).cast("bigint"))
                * 100.0
                / F.count("p")
            )
            / 10000.0
        ).alias("m")
    ).first()["m"]
    want = duckdb.sql(
        "SELECT round(sum(CAST(round(p * 100) AS BIGINT)) * 100.0"
        "             / count(p)) / 10000.0"
        " FROM (SELECT unnest(?) AS p)",
        params=[vals],
    ).fetchone()[0]
    assert got == want == 1.0001  # exact tie resolves half-away, both engines


def test_ln_quantization_is_stable_across_engines(spark):
    """Java Math.log and DuckDB's libm ln disagree by 1 ulp on ~6% of
    inputs (measured on 796 tfidf-style ratios), so any log-based score
    is engine-noisy. Quantizing the score to 1e-6 BIGINTs (the
    tfidf_top_terms form) must absorb that noise on the same battery."""
    pairs = [(n, df_) for n in (499, 500, 1000, 9973) for df_ in range(1, 200)]
    sdf = spark.createDataFrame(
        [(float(n), float(d)) for n, d in pairs], "n double, d double"
    )
    got = [
        r["q"]
        for r in sdf.select(
            F.round(F.log(F.col("n") / F.col("d")) * 1000000)
            .cast("bigint")
            .alias("q")
        ).collect()
    ]
    want = [
        duckdb.sql(
            "SELECT CAST(round(ln(? / ?) * 1000000) AS BIGINT)",
            params=[float(n), float(d)],
        ).fetchone()[0]
        for n, d in pairs
    ]
    assert got == want


# ---------------------------------------------------------------------------
# Round-7 pin: the zero-norm (degenerate-vector) cosine class, found by
# the degenboost stress shape. Cosine is undefined when either norm is
# 0; Spark's ANSI `/` throws DIVIDE_BY_ZERO there — one all-zero
# embedding would kill a 100 TB job — while DuckDB's `/` returns NULL.
# Every cosine site therefore divides with try_divide (_cosine helper),
# and every top-k/window rank filters NULL cosines explicitly on BOTH
# engines so NULL ordering can never diverge.
# ---------------------------------------------------------------------------


def test_zero_norm_cosine_yields_null_not_error(spark):
    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload.extension_queries import (
        _cosine,
        _dot,
        _norm,
    )

    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0], [1.0, 2.0, 2.0]),  # zero left norm
            (1, [1.0, 0.0, 0.0], [0.0, 0.0, 0.0]),  # zero right norm
            (2, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]),  # both zero (0/0)
            (3, [3.0, 0.0, 4.0], [3.0, 0.0, 4.0]),  # well-defined
        ],
        "id long, a array<double>, b array<double>",
    )
    rows = {
        r["id"]: r["c"]
        for r in df.select(
            "id",
            _cosine(
                _dot(F.col("a"), F.col("b")), _norm(F.col("a")) * _norm(F.col("b"))
            ).alias("c"),
        ).collect()
    }
    assert rows[0] is None and rows[1] is None and rows[2] is None
    assert abs(rows[3] - 1.0) < 1e-12
    # and DuckDB's plain `/` agrees on the NULL rows
    assert duckdb.sql("SELECT 0.0 / 0.0").fetchone()[0] is None


# ---------------------------------------------------------------------------
# Round-7 pin: the hostile-JSON extraction contract (jsonboost shape).
# DuckDB's json functions THROW on malformed documents and Spark's
# ANSI CAST throws on non-numeric strings; each extraction path has
# its own total, cross-engine-identical contract (reference_queries):
#   _SPARK_K/_DUCK_K     per-path gjo: integer-literal regex + try_cast
#   from_json/_DUCK_K_TYPED  only in-range JSON integer NUMBERS
#   try_variant_get/_DUCK_K_VARIANT  cast-style coercion by JSON type
# Duplicate-key objects are OUT of contract (parser-undefined: Spark
# from_json takes the LAST occurrence, DuckDB the FIRST).
# ---------------------------------------------------------------------------

_HOSTILE_PROPS = [
    '{"k": 7', "not json at all", "", '{"k": "seven"}', '{"k": [1, 2]}',
    '{"k": {"a": 1}}', "[1, 2, 3]", "7", "null", '{"K": 7}', '{"k": 7.9}',
    '{"k": true}', '{"k": false}', '{"k": 1e3}', '{"k": "0x7"}',
    '{"k": "  -42  "}', '{"k": 99999999999999999999}', '{"k": null}',
    '{"k": "7"}', '{"k": "+7"}', '{"k": -0.5}', '{"k": "7.9"}',
    '{"k": 12}', None,
]


def test_hostile_json_contract(spark):
    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload.reference_queries import (
        _DUCK_K,
        _DUCK_K_TYPED,
        _DUCK_K_VARIANT,
        _SPARK_K,
    )

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(_HOSTILE_PROPS)], "i int, props string"
    )
    got = {
        r["i"]: (r["a"], r["b"], r["c"])
        for r in df.select(
            "i",
            F.expr(_SPARK_K).alias("a"),
            F.from_json("props", "k bigint").getField("k").alias("b"),
            F.expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").alias(
                "c"
            ),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, props VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(_HOSTILE_PROPS))
    )
    want = {
        i: (a, b, c)
        for i, a, b, c in con.sql(
            f"SELECT i, {_DUCK_K} AS a, {_DUCK_K_TYPED} AS b, "
            f"({_DUCK_K_VARIANT}) AS c FROM t"
        ).fetchall()
    }
    assert got == want
    # and the well-formed row extracts the value, proving the guards
    # aren't just NULL-ing everything
    assert got[22] == (12, 12, 12)
