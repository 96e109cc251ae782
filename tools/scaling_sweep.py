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
]

# Queries whose cost is expected to grow faster than the table because
# the DOMAIN grows (pair candidates, graph wedges): called out honestly
# rather than hidden.
SUPERLINEAR_EXPECTED = {
    "triangle_count_coorder": "wedge volume grows with degree^2, not rows",
    "dedup_ngram_jaccard": "capped posting-list pairs grow with df-cap^2 x shingle count",
    "dedup_prefix_filter_jaccard": "exact-recall candidate pairs grow with near-dup density",
    "dedup_minhash_lsh": "band-bucket collision pairs grow with near-dup density",
}


def main() -> int:
    from copenhagen_traffic_and_weather_etl_pipeline_spark.session import get_spark
    from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import REGISTRY

    spark = get_spark(app_name="scaling-sweep")
    # Warm the session once.
    REGISTRY[QUERIES[0]].fn(spark, resolve_sf(str(SFS[0]))).write.format(
        "noop"
    ).mode("overwrite").save()

    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for sf in SFS:
        sf_dir = resolve_sf(str(sf))
        for q in QUERIES:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                REGISTRY[q].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            results[q][sf] = best

    print("# SCALING_SWEEP — measured wall time across scale factors\n")
    print(
        "Best-of-2 full materialization (noop sink) per query per SF on "
        "local[32]. `x10 ratio` = t(sf0.1)/t(sf0.01) over a 10x data "
        "step: << 10 means fixed overhead still dominates, ~10 is "
        "linear-in-data, > 10 is super-linear and annotated with why. "
        "Regenerate: `python tools/scaling_sweep.py > SCALING_SWEEP.md`.\n"
    )
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | x10 ratio | note |")
    print("|---|---|---|---|---|---|")
    flagged = 0
    for q in QUERIES:
        r = results[q]
        ratio = r["0.1"] / r["0.01"] if r["0.01"] > 0 else float("nan")
        note = ""
        if ratio > 10:
            note = SUPERLINEAR_EXPECTED.get(q, "**UNEXPECTED super-linear**")
            if q not in SUPERLINEAR_EXPECTED:
                flagged += 1
        print(
            f"| {q} | {r['0.001']:.2f} | {r['0.01']:.2f} | {r['0.1']:.2f} "
            f"| {ratio:.1f} | {note} |"
        )
    print(
        f"\nUnexpected super-linear queries: **{flagged}**"
        + ("" if flagged == 0 else " — investigate before scaling out")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
