"""Round-13 hardening gates for the blocked embedding-pair scorer
(`workload/extension_queries._cosine_pairs_blocked`).

Pins the round-12 verdict + advice items:

- the documented block-size bound is ENFORCED, not advisory: a block
  whose row count exceeds ``max_block_rows`` is triangle-sharded into
  hash chunks, every within-block pair still appears exactly once, and
  an in-scorer guard raises if the shard routing ever regresses (so the
  equality test below passing PROVES sharding engaged — an unsharded
  400-row task at max_block_rows=50 trips the guard);
- the boundary-rounding escape hatch quantizes the SCALED double
  product and therefore agrees with live DuckDB ``round(x, 4)``
  bit-for-bit (the old code quantized the exact binary expansion of x,
  which flips 0.76625-style boundary values the fast path already got
  right);
- NULL blocking keys are dropped, matching the inner equi-join the
  scorer replaced (they used to form their own pandas group and crash
  on ``int(NaN)``).
"""

from __future__ import annotations

import math
import random

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from copenhagen_traffic_and_weather_etl_pipeline_spark.workload.extension_queries import (
    _cosine_pairs_blocked,
    _round_half_up_4dp,
)

_THRESHOLD = 0.4
_DIM = 4


def _corpus(n: int, n_labels: int = 1) -> pd.DataFrame:
    """Deterministic vectors with heavy near-dup structure: a few base
    directions plus small perturbations, so plenty of pairs clear the
    0.4 cosine threshold and several land near rounding boundaries."""
    rng = random.Random(13)
    bases = [[1.0, 0.5, 0.25, 0.125], [0.2, 1.0, 0.4, 0.3], [0.7, 0.1, 1.0, 0.9]]
    rows = []
    for i in range(n):
        base = bases[i % len(bases)]
        vec = [round(b + rng.uniform(-0.2, 0.2), 3) for b in base]
        rows.append({"vec_id": i, "label": i % n_labels, "embedding": vec})
    return pd.DataFrame(rows)


def _expected_pairs(pdf: pd.DataFrame) -> set[tuple[int, int, float]]:
    """Brute-force oracle with the scorer's exact arithmetic contract:
    dimension-ordered float64 accumulation, NULL-on-zero-norm drop,
    half-away-from-zero rounding of the scaled product."""
    out = set()
    rows = pdf.sort_values("vec_id").to_dict("records")
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a["label"] != b["label"]:
                continue
            dot = nrm_a = nrm_b = 0.0
            for d in range(_DIM):
                dot += float(a["embedding"][d]) * float(b["embedding"][d])
                nrm_a += float(a["embedding"][d]) ** 2
                nrm_b += float(b["embedding"][d]) ** 2
            denom = math.sqrt(nrm_a) * math.sqrt(nrm_b)
            if denom <= 0:
                continue
            cos = dot / denom
            rounded = float(_round_half_up_4dp(np.array([cos]))[0])
            if rounded >= _THRESHOLD:
                out.add((a["vec_id"], b["vec_id"], rounded))
    return out


def _run(spark, pdf: pd.DataFrame, **kwargs) -> set[tuple[int, int, float]]:
    e = spark.createDataFrame(pdf).select(
        "vec_id", F.col("label").cast("bigint").alias("label"), "embedding"
    )
    got = _cosine_pairs_blocked(e, "label", _THRESHOLD, **kwargs).collect()
    return {(r["v1"], r["v2"], r["cosine"]) for r in got}


def test_sharded_equals_unsharded_equals_bruteforce(spark):
    # One 400-row block at max_block_rows=50 → ceil(400/50) = 8 hash
    # chunks, 36 shard-pair tasks. If the oversized-block pre-pass
    # failed to engage, the in-scorer guard (3 * 50 + 64 = 214 < 400)
    # would raise instead of silently running one giant task.
    pdf = _corpus(400)
    expected = _expected_pairs(pdf)
    assert len(expected) > 1000, "test corpus lost its near-dup structure"
    sharded = _run(spark, pdf, max_block_rows=50)
    unsharded = _run(spark, pdf)
    assert sharded == unsharded == expected


def test_sharding_preserves_multiblock_and_ragged_semantics(spark):
    # Multiple labels where only one is oversized; plus a ragged-length
    # vector (never pairs with the fixed-dim rows) and a zero vector
    # (zero norm → dropped on both engines).
    pdf = _corpus(120, n_labels=3)
    pdf.at[0, "embedding"] = [1.0, 2.0]  # ragged: pairs with nothing
    pdf.at[3, "embedding"] = [0.0, 0.0, 0.0, 0.0]  # zero norm
    # Neither row can form a pair (ragged lengths NULL the zip_with
    # dot; zero norm NULLs the division), so the oracle runs on the
    # fixed-dim, nonzero remainder.
    expected = _expected_pairs(pdf.drop(index=[0, 3]))
    assert not any(0 in p[:2] or 3 in p[:2] for p in expected)
    # max_block_rows=30 shards only the 40-row labels.
    assert _run(spark, pdf, max_block_rows=30) == expected


def test_null_block_key_rows_are_dropped_like_the_old_join(spark):
    pdf = _corpus(20)
    pdf["label"] = pdf["label"].astype("object")
    pdf.loc[5, "label"] = None
    pdf.loc[6, "label"] = None
    expected = _expected_pairs(pdf[pdf["label"].notna()])
    got = _run(spark, pdf)
    assert got == expected
    assert not any(5 in p[:2] or 6 in p[:2] for p in got)


def _expected_pairs_general(pdf: pd.DataFrame) -> set[tuple[int, int, float]]:
    """Generalized brute-force oracle: ragged lengths never pair (the
    zip_with-NULL contract), zero norms drop, NULL labels drop, and the
    arithmetic is the scorer's exact contract (dimension-ordered float64
    accumulation, half-away-from-zero rounding of the scaled product)."""
    out = set()
    rows = pdf[pdf["label"].notna()].sort_values("vec_id").to_dict("records")
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a["label"] != b["label"] or len(a["embedding"]) != len(b["embedding"]):
                continue
            dot = nrm_a = nrm_b = 0.0
            for d in range(len(a["embedding"])):
                dot += float(a["embedding"][d]) * float(b["embedding"][d])
                nrm_a += float(a["embedding"][d]) ** 2
                nrm_b += float(b["embedding"][d]) ** 2
            denom = math.sqrt(nrm_a) * math.sqrt(nrm_b)
            if denom <= 0:
                continue
            cos = dot / denom
            if not math.isfinite(cos):
                continue
            rounded = float(_round_half_up_4dp(np.array([cos]))[0])
            if rounded >= _THRESHOLD:
                out.add((a["vec_id"], b["vec_id"], rounded))
    return out


_VALS = st.sampled_from([0.0, 0.5, -0.5, 1.0, 0.1, 0.76625, -1.0, 2.0, 0.333])
_VEC = st.lists(_VALS, min_size=2, max_size=3)
_ROW = st.tuples(_VEC, st.sampled_from([0, 0, 0, 1, None]))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(_ROW, min_size=2, max_size=24),
    max_rows=st.sampled_from([4, 1_000_000]),
)
def test_property_scorer_matches_bruteforce(spark, corpus, max_rows):
    # Random ragged/degenerate corpora with NULL labels, at both an
    # absurdly small max_block_rows (forces sharding of nearly every
    # block) and the production default (never shards): the scorer must
    # equal the exact-arithmetic brute force either way.
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(corpus)),
            "label": pd.array(
                [lab for _, lab in corpus], dtype="Int64"
            ).astype("object"),
            "embedding": [vec for vec, _ in corpus],
        }
    )
    assert _run(spark, pdf, max_block_rows=max_rows) == _expected_pairs_general(pdf)


def test_round_half_up_4dp_matches_live_duckdb():
    # The values both engines round are float64 cosines; the contract
    # is DuckDB round(x, 4) == _round_half_up_4dp(x) bit-for-bit.
    # 0.76625 is the ADVICE counterexample: its scaled product is
    # EXACTLY 7662.5 in float64, so half-away-from-zero gives 0.7663 —
    # quantizing the binary expansion of x (0.76624999...) gave 0.7662.
    vals = [0.76625, -0.76625, 0.5, -0.5, 0.0, 1.0, -1.0]
    rng = random.Random(7)
    for _ in range(4000):
        k = rng.randint(-10000, 10000)
        # Exact-boundary, just-below, just-above, and generic offsets.
        for off in (0.00005, 0.000049999999, 0.0000500001, rng.uniform(0, 1e-4)):
            vals.append(k / 1e4 + off)
    # Perturb at the ULP scale to exercise the representation-error band.
    vals += [float(np.nextafter(v, v + 1.0)) for v in vals[:2000]]
    vals += [float(np.nextafter(v, v - 1.0)) for v in vals[:2000]]
    x = np.array(vals, dtype=np.float64)
    ours = _round_half_up_4dp(x)
    theirs = (
        duckdb.sql("SELECT round(x, 4) AS r FROM (SELECT unnest($vals) AS x)",
                   params={"vals": vals})
        .fetchnumpy()["r"]
    )
    mismatch = np.flatnonzero(ours != theirs)
    assert mismatch.size == 0, [
        (vals[int(i)], float(ours[int(i)]), float(theirs[int(i)]))
        for i in mismatch[:10]
    ]


def test_boundary_suspects_take_the_decimal_path():
    # Sanity: the 1e-8 suspect band actually fires on exact .5 scaled
    # products and resolves them via Decimal on the SCALED value.
    x = np.array([0.76625])
    assert float(_round_half_up_4dp(x)[0]) == pytest.approx(0.7663, abs=0)


def test_scorer_output_batches_never_exceed_emit_rows(monkeypatch):
    # The load-bearing fix of round 13: a dense block's pair output must
    # stream out as MANY bounded Arrow batches (each yielded frame is
    # one batch under mapInPandas), never as one giant allocation. Drive
    # the partition generator directly with a dense single-task block
    # whose survivors exceed a small _EMIT_ROWS override and pin:
    # multiple frames, every frame within the bound, and the union of
    # frames equal to the brute-force oracle (the bound must slice the
    # result, not change it).
    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import (
        extension_queries as eq,
    )

    pdf = _corpus(80)
    expected = _expected_pairs(pdf)
    bound = 100
    assert len(expected) > 3 * bound, "corpus too sparse to exercise the bound"

    task = pdf.copy()
    task["label"] = task["label"].astype("int64")
    task["_sa"] = 0
    task["_sb"] = 0
    task["_c"] = 0

    monkeypatch.setattr(eq, "_EMIT_ROWS", bound)
    scorer = eq._blocked_scorer("label", _THRESHOLD, max_block_rows=1_000_000)
    frames = list(scorer(iter([task])))

    assert len(frames) > 1, "dense block produced a single output batch"
    assert max(len(f) for f in frames) <= bound
    got = {
        (int(r.v1), int(r.v2), float(r.cosine))
        for f in frames
        for r in f.itertuples()
    }
    assert got == expected
