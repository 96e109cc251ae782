"""Empirical scaling sweep: time representative queries at every
available scale factor and report the growth ratio across each 10x
data step — the measured answer to "does this plan scale linearly?".

A ratio well under 10 on a 10x step means fixed overhead still
dominates (fine); ~10 means linear in data; meaningfully above 10
means super-linear work (quadratic candidate generation, global sorts)
and is called out. Writes SCALING_SWEEP.md content to stdout.

Usage: python tools/scaling_sweep.py > SCALING_SWEEP.md
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from copenhagen_traffic_and_weather_etl_pipeline_spark.testdata import (  # noqa: E402
    sf_dir as resolve_sf,
)

SFS = ["0.001", "0.01", "0.1"]

QUERIES = [
    "flagship_latest_snapshot",
    "pricing_summary",
    "outer_join_order_counts",
    "latest_per_key",
    "sessionize_events",
    "cube_revenue",
    "window_running_total",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_prefix_filter_jaccard",
    "sim_topk_bruteforce",
    "ivf_ann_search",
    "tfidf_top_terms",
    "text_quality",
    "bm25_retrieval",
    "bpe_pair_merges",
    "triangle_count_coorder",
    "assign_contiguous_ids",
    "equidepth_histogram",
    "zorder_cluster_key",
    "kmv_set_intersection",
    "merge_upsert_cdc",
    "heavy_hitters_tokens",
    "decontaminate_bloom",
    # round 6 additions: decorrelation shapes + streaming replays (the
    # replays run a real Structured Streaming job per call, so their
    # floor is micro-batch machinery — expect ratios well under 10)
    "small_qty_revenue_q17",
    "top_supplier_share_q20",
    "sessionize_stream_replay",
    "stream_join_replay",
    # round 12 additions: the blocked embedding-pair queries — cheap at
    # sf0.1 (2k vectors) but with a quadratic candidate space that an
    # absolute-cost top-N never swept; on replica data their ANSWER is
    # quadratic too (labels are the Gaussian clusters, so essentially
    # all within-block pairs qualify), so their upper decades measure
    # output cost, not plan waste.
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    # round 13 addition: the third member of the embedding-pair family —
    # this round's sf1 completion gate caught it still running the
    # interpreted per-pair fold its siblings lost in r12 (never before
    # run at sf1); swept so the whole family carries sf1 rows per round.
    "dedup_semantic_kmeans",
    # round 17 addition: the pair-enumeration -> window-counting
    # rewrite must carry decade evidence (its former quadratic growth
    # was never swept — the sf1 core sweep is what exposed it).
    "record_linkage_score",
]

# Queries whose execution forks Python workers (mapInPandas /
# applyInPandas / Arrow batch transfer) or a Structured Streaming
# micro-batch engine. Under the fresh-JVM-per-decade protocol their
# small-SF absolute times include a per-JVM worker-spawn + Arrow-init
# floor that a warm session never shows (round-14 verdict cosmetic
# item: cosine sf0.001 read 4.1 s where a shared session measures
# 0.57 s). The floor is measured once per decade worker and published
# in the header; these rows carry a dagger so nobody reads their
# sf0.001 column as a regression.
PY_WORKER_FLOOR = {
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_semantic_kmeans",
    "heavy_hitters_tokens",
    "sessionize_stream_replay",
    "stream_join_replay",
}

# Queries whose cost is expected to grow faster than the table because
# the DOMAIN grows (pair candidates, graph wedges): called out honestly
# rather than hidden.
SUPERLINEAR_EXPECTED = {
    "triangle_count_coorder": "wedge volume grows with degree^2, not rows",
    "dedup_ngram_jaccard": "capped posting-list pairs grow with df-cap^2 x shingle count",
    "dedup_prefix_filter_jaccard": "exact-recall candidate pairs grow with near-dup density",
    "dedup_minhash_lsh": "band-bucket collision pairs grow with near-dup density",
    "dedup_embedding_cosine": "replica labels are the Gaussian clusters — ~ALL "
    "within-label pairs qualify, so the ANSWER itself grows quadratically",
    "dedup_embedding_lsh": "within-bucket similarity is what LSH buckets select "
    "for — qualifying pairs (the answer) grow quadratically on clustered data",
    "dedup_semantic_kmeans": "k-means recovers the generating Gaussians, so "
    "within-cluster pairs (the answer) grow quadratically — output-bound like "
    "its label/LSH siblings",
}


def _worker(sf: str, queries: list[str]) -> int:
    """Time the given queries at one SF in THIS process and print JSON.

    Each decade runs in its own subprocess (fresh JVM) because a
    long-lived session accumulates allocator/JIT state that inflates
    late-sweep measurements 4-5x (round 13: dedup_embedding_lsh
    recorded 168 s at sf1 after ~2200 stages where a fresh session
    measures 33-42 s on the identical tree). Committed sweep numbers
    must be steady-state, so the parent forks one worker per decade.
    """
    import json

    from copenhagen_traffic_and_weather_etl_pipeline_spark.session import get_spark
    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import REGISTRY

    spark = get_spark(app_name=f"scaling-sweep-sf{sf}")
    # Warm the fresh JVM once (codegen, Arrow, shuffle machinery) on the
    # smallest SF so warm-up cost never pollutes the first timed query.
    REGISTRY[QUERIES[0]].fn(spark, resolve_sf(str(SFS[0]))).write.format(
        "noop"
    ).mode("overwrite").save()

    # Measure this JVM's Python-worker floor once: a 1-row mapInPandas
    # identity pays daemon spawn + Arrow init exactly like the first
    # real Python-worker query would. Best-of-2 so the number reported
    # is the PERSISTENT per-plan floor (worker reuse absorbs the spawn
    # on the second run), matching what each timed query's best-of-2
    # actually contains.
    tiny = spark.range(1)
    floor = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        tiny.mapInPandas(lambda it: it, "id long").write.format("noop").mode(
            "overwrite"
        ).save()
        floor = min(floor, time.perf_counter() - t0)

    sf_dir = resolve_sf(sf)
    out: dict[str, float] = {"__py_floor__": floor}
    for q in queries:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[q].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[q] = best
    print("WORKER_RESULT " + json.dumps(out))
    return 0


def _run_decade(sf: str, queries: list[str]) -> dict[str, float]:
    """Fork a fresh-JVM worker for one decade and collect its timings."""
    import json
    import subprocess

    proc = subprocess.run(
        [sys.executable, __file__, "--worker-sf", sf, "--worker-queries",
         ",".join(queries)],
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"sweep worker for sf{sf} failed:\n{proc.stdout}\n{proc.stderr}"
        )
    for line in proc.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT "):])
    raise RuntimeError(f"sweep worker for sf{sf} printed no result:\n{proc.stdout}")


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--extra-sf",
        default="0.3",
        help="one more scale decade run only for the costliest queries "
        "(resolved through the replica generator if the driver has no "
        "such dir); pass '' to skip",
    )
    ap.add_argument(
        "--extra-top",
        type=int,
        default=10,
        help="how many of the most-expensive-at-sf0.1 queries get the "
        "extra-sf column",
    )
    ap.add_argument("--worker-sf", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--worker-queries", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.worker_sf is not None:
        return _worker(args.worker_sf, args.worker_queries.split(","))
    if args.extra_sf:
        # Normalize spelling ("1.0" -> "1") to the one directory name
        # the replica generator writes (gen_sf uses f"sf{sf:g}").
        args.extra_sf = f"{float(args.extra_sf):g}"

    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    floors: dict[str, float] = {}
    for sf in SFS:
        decade = _run_decade(str(sf), QUERIES)
        floors[sf] = decade.pop("__py_floor__", float("nan"))
        for q in QUERIES:
            results[q][sf] = decade[q]

    # One more decade for the most expensive queries: sf0.001->0.1
    # ratios can flatter a plan while fixed overhead dominates; the
    # extra step checks the growth rate where data actually dominates.
    # ALSO take any query whose sf0.01->0.1 growth already exceeds 4x —
    # top-N-by-absolute-cost has a measured blind spot (round 12): a
    # query still cheap at sf0.1 whose candidate space is quadratic
    # (dedup_embedding_cosine, 500M pairs at sf1) never made the top-10
    # and its single-task interpreted fold went unswept until a full
    # sf1 gate hit it.
    extra: dict[str, float] = {}
    extra_sf = args.extra_sf
    if extra_sf:
        top = sorted(QUERIES, key=lambda q: -results[q]["0.1"])[: args.extra_top]
        growers = [
            q
            for q in QUERIES
            if q not in top and results[q]["0.1"] > 4 * max(results[q]["0.01"], 0.05)
        ]
        # Known-quadratic-domain queries ALWAYS get the extra decade:
        # both heuristics above are timing-based and can miss a query
        # whose small-SF cost is flat because the scorer is fast while
        # its candidate/output space still grows quadratically (round
        # 12's dedup_embedding_cosine: ~1 s at sf0.1, 500M pairs at
        # sf1). The expected-super-linear set is exactly the list of
        # queries whose upper decade must never go unmeasured.
        known = [
            q
            for q in SUPERLINEAR_EXPECTED
            if q in QUERIES and q not in top and q not in growers
        ]
        # record_linkage_score's r17 rewrite exists PRECISELY to kill a
        # quadratic upper decade (96.9 -> 2.6 s at sf1); its extra-sf
        # row is the per-round regression canary for that property, so
        # it rides along even when cheap enough to miss the top-N.
        for q in ("record_linkage_score",):
            if q in QUERIES and q not in top and q not in growers:
                known.append(q)
        resolve_sf(extra_sf)  # materialize replica data once, untimed
        extra = _run_decade(extra_sf, top + growers + known)
        # The extra decade's JVM measures its own Python-worker floor
        # too — pop it like the main decades do (a stray pseudo-query
        # key would otherwise dangle in `extra`) and report it in the
        # floor line so dagger rows in the extra-sf column are covered
        # (round-15 advice).
        floors[extra_sf] = extra.pop("__py_floor__", float("nan"))

    step = float(extra_sf) / 0.1 if extra_sf else None
    print("# SCALING_SWEEP — measured wall time across scale factors\n")
    extra_blurb = (
        f"The {args.extra_top} costliest queries get one more decade "
        f"(sf{extra_sf}, replica data): `x{step:g} ratio` compares to "
        f"the linear expectation {step:g}. "
        if extra_sf
        else ""
    )
    print(
        "Best-of-2 full materialization (noop sink) per query per SF on "
        "local[32]; each SF decade runs in a FRESH subprocess JVM so "
        "numbers are steady-state, not inflated by session-tail "
        "allocator/JIT state (round 13 measured a 4-5x late-sweep "
        "inflation after ~2200 stages in one session). "
        "`x10 ratio` = t(sf0.1)/t(sf0.01) over a 10x data "
        "step: << 10 means fixed overhead still dominates, ~10 is "
        "linear-in-data, > 10 is super-linear and annotated with why. "
        + extra_blurb
        + "Core-count (c8 vs c32) scaling at sf1 lives in "
        "CPU_SCALING_SF1.md (tools/cpu_scaling_sweep.py) — on this "
        "host steal is load-induced above ~8-16 busy cores, so growth "
        "ratios here are the trustworthy scaling signal. "
        "Regenerate: `python tools/scaling_sweep.py > SCALING_SWEEP.md`.\n"
    )
    floor_sfs = list(SFS) + ([extra_sf] if extra_sf else [])
    floor_txt = ", ".join(f"sf{sf}: {floors[sf]:.2f} s" for sf in floor_sfs)
    print(
        "Queries marked † fork Python workers (mapInPandas/Arrow or a "
        "streaming micro-batch engine); under the fresh-JVM protocol "
        "each decade pays a persistent per-plan Python-worker + "
        "Arrow-init floor a warm shared session never shows, measured "
        f"in each decade's JVM as a 1-row mapInPandas round-trip: "
        f"{floor_txt}. Their small-SF absolute columns sit on that "
        "floor — read the growth ratios, not the absolutes, below "
        "sf0.1.\n"
    )
    extra_head = f"| sf{extra_sf} s | x{step:g} ratio " if extra_sf else ""
    print(
        f"| query | sf0.001 s | sf0.01 s | sf0.1 s | x10 ratio "
        f"{extra_head}| note |"
    )
    print("|---|---|---|---|---|" + ("---|---|" if extra_sf else "") + "---|")
    flagged = 0
    for q in QUERIES:
        r = results[q]
        ratio = r["0.1"] / r["0.01"] if r["0.01"] > 0 else float("nan")
        note = ""
        superlinear = ratio > 10
        if q in extra:
            eratio = extra[q] / r["0.1"] if r["0.1"] > 0 else float("nan")
            ecols = f" {extra[q]:.2f} | {eratio:.1f} |"
            # Growth-vs-linear only means something on an UPWARD step:
            # below sf0.1 fixed overhead dominates and the ratio floor
            # sits near 1 regardless of the plan.
            superlinear = superlinear or (step and step > 1 and eratio > step)
        else:
            ecols = " — | — |" if extra_sf else ""
        if superlinear:
            note = SUPERLINEAR_EXPECTED.get(q, "**UNEXPECTED super-linear**")
            if q not in SUPERLINEAR_EXPECTED:
                flagged += 1
        mark = " †" if q in PY_WORKER_FLOOR else ""
        print(
            f"| {q}{mark} | {r['0.001']:.2f} | {r['0.01']:.2f} | {r['0.1']:.2f} "
            f"| {ratio:.1f} |{ecols} {note} |"
        )
    print(
        f"\nUnexpected super-linear queries: **{flagged}**"
        + ("" if flagged == 0 else " — investigate before scaling out")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
