"""CI enforcement of the driver-window freshness policy.

Every registry entry's correctness evidence is a green driver-gate row
earned on some past round's tree. tools/window_freshness.json records,
per entry, that round and the entry's definition hash AT that tree
(fn source + oracle + imported engine-module sources — see
tools/freshness.py). This test recomputes the hashes against the
current tree and fails if any entry whose definition drifted since its
evidence — or that has no evidence at all — is missing from
``_DRIVER_WINDOW`` (the first 50 registry entries, which the driver
re-proves next round).

This automates what rounds 4-7 did by hand (ROUND7_NOTES.md §3) and
closes the two observed blind spots: changes landed in the same round
as a gate but after it ran, and operator-module changes invisible to a
fn+oracle-only hash (the round-7 asof case).

After a new CORRECTNESS_r*.json lands, refresh the baseline with
``python tools/freshness.py --baseline`` (requires the round's tree to
be committed so the per-round git worktrees resolve).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from freshness import compute_hashes, newest_green_rounds  # noqa: E402

from copenhagen_traffic_and_weather_etl_pipeline_spark.workload import (  # noqa: E402
    REGISTRY,
    _DRIVER_WINDOW,
    _NEXT_WINDOW,
)

BASELINE = json.loads((REPO / "tools" / "window_freshness.json").read_text())


def test_window_shape():
    assert len(_DRIVER_WINDOW) == 50, "driver checks exactly 50 entries"
    assert len(set(_DRIVER_WINDOW)) == 50, "window has duplicates"
    unknown = [n for n in _DRIVER_WINDOW + _NEXT_WINDOW if n not in REGISTRY]
    assert not unknown, f"window names not in REGISTRY: {unknown}"
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW, (
        "registry insertion order must put the window first — "
        "_rotate_registry() not applied?"
    )
    assert not set(_DRIVER_WINDOW) & set(_NEXT_WINDOW)


def test_changed_or_unproven_entries_are_in_window():
    current = compute_hashes(REPO)
    needs_slot: dict[str, str] = {}
    for name in REGISTRY:
        rec = BASELINE.get(name)
        if rec is None:
            needs_slot[name] = "no green driver row recorded"
        elif rec["hash"] is None:
            needs_slot[name] = f"unresolvable at its green round r{rec['round']}"
        elif rec["hash"] != current[name]:
            needs_slot[name] = (
                f"definition changed since its newest green row "
                f"(r{rec['round']} @ {rec['rev']})"
            )
    missing = {n: why for n, why in needs_slot.items() if n not in set(_DRIVER_WINDOW)}
    assert not missing, (
        "entries with invalidated/absent driver evidence must be in "
        f"_DRIVER_WINDOW for re-proof: {json.dumps(missing, indent=1)}"
    )


def test_baseline_rounds_match_correctness_artifacts():
    """The checked-in baseline must agree with the CORRECTNESS_r*.json
    ledger about each entry's newest green round — a stale baseline
    (e.g. not regenerated after a new round's artifacts landed) would
    silently weaken the drift check above."""
    newest = newest_green_rounds(REPO)
    stale = {
        n: (BASELINE.get(n, {}).get("round"), r)
        for n, r in newest.items()
        if n in REGISTRY and BASELINE.get(n, {}).get("round") != r
    }
    assert not stale, (
        "window_freshness.json is out of date (baseline round vs ledger): "
        f"{stale} — rerun `python tools/freshness.py --baseline`"
    )
