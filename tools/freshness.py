"""Driver-window freshness: definition hashes for every registry entry.

The correctness driver proves 50 registry entries per round; the other
entries stand on older green rows. That evidence is only valid while
the entry's DEFINITION is unchanged, so each entry gets a content hash
over everything that determines its behavior:

  * ``inspect.getsource(fn)`` — the query function itself. Engine
    imports in this repo are function-level (``from ..operators.dedup
    import ...`` inside the body), so the source captures which engine
    modules the entry depends on;
  * the oracle SQL string as materialized at registration (this also
    catches composed oracles such as ``dedup_method_eval``, whose
    oracle embeds other entries' SQL built at import time);
  * the full source of every first-party engine module the function
    (or its defining module, at top level) imports — ``operators/*``,
    ``plans``, ``functions``, ``schemas``, ``streaming/*`` … — closing
    the round-7 "asof blind spot" where an operator-level semantic fix
    was invisible to a fn+oracle hash.

Known limitation (documented, reviewed per-round): an intra-module
helper called by the fn but defined outside it is not hashed unless the
oracle captures it; the local 175-entry oracle gate still covers such
drift behaviorally.

Usage:
    python tools/freshness.py --dump [--repo DIR]
        Print one JSON object {entry: hash} for the tree at DIR
        (default: this repo).
    python tools/freshness.py --baseline
        Rebuild tools/window_freshness.json: for each entry, its
        newest green driver round (from CORRECTNESS_r*.json) and its
        definition hash AT THAT ROUND'S TREE (via a temporary git
        worktree per round). Entries whose current definition differs
        from the recorded hash must sit in ``_DRIVER_WINDOW`` — CI
        enforces this in tests/test_window_freshness.py.
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "copenhagen_traffic_and_weather_etl_pipeline_spark"

# Tree each round's driver gate ran against: the round-N verdict commit
# (artifact-only on top of the builder's final tree, so the package
# contents are identical to what the gate imported).
ROUND_REVS = {
    1: "634b8d0",
    2: "0db5145",
    3: "7218bc7",
    4: "e54faa2",
    5: "f0491d0",
    # round 6 was void (wiped testdata) — no entry's newest green is 6.
    7: "6609c87",
}

_IMPORT_RE = re.compile(
    rf"from (?:\.\.|{PKG}\.)([A-Za-z_][\w.]*) import"
)


def _module_file(pkg_root: Path, dotted: str) -> Path | None:
    """``operators.dedup`` -> operators/dedup.py or operators/dedup/__init__.py."""
    rel = dotted.replace(".", "/")
    for cand in (pkg_root / f"{rel}.py", pkg_root / rel / "__init__.py"):
        if cand.exists():
            return cand
    return None


def _toplevel_engine_imports(module_path: Path) -> set[str]:
    """Dotted engine-module names imported at a workload module's top level."""
    tree = ast.parse(module_path.read_text())
    out: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.ImportFrom) and node.module:
            if node.level == 2:  # from ..X import ...
                out.add(node.module)
            elif node.level == 0 and node.module.startswith(PKG + "."):
                out.add(node.module[len(PKG) + 1 :])
    return out


def compute_hashes(repo: Path) -> dict[str, str]:
    sys.path.insert(0, str(repo))
    import importlib
    import inspect

    workload = importlib.import_module(f"{PKG}.workload")
    pkg_root = repo / PKG
    module_imports: dict[str, set[str]] = {}
    src_cache: dict[str, str] = {}

    def module_src(dotted: str) -> str:
        if dotted not in src_cache:
            f = _module_file(pkg_root, dotted)
            src_cache[dotted] = f.read_text() if f else f"<missing:{dotted}>"
        return src_cache[dotted]

    hashes: dict[str, str] = {}
    for name, spec in workload.REGISTRY.items():
        fn = spec.fn
        src = inspect.getsource(fn)
        mod_file = Path(inspect.getsourcefile(fn))
        mod_key = str(mod_file)
        if mod_key not in module_imports:
            module_imports[mod_key] = _toplevel_engine_imports(mod_file)
        deps = set(module_imports[mod_key])
        deps |= {m.group(1) for m in _IMPORT_RE.finditer(src)}
        # `from . import load, register` style (workload-internal) is
        # level-1 and deliberately excluded: the shared loader is part
        # of the harness, not a per-entry definition.
        parts = [src, spec.oracle or ""]
        parts += [f"{d}\x00{module_src(d)}" for d in sorted(deps)]
        hashes[name] = hashlib.sha256("\x00\x01".join(parts).encode()).hexdigest()
    return hashes


def newest_green_rounds(repo: Path) -> dict[str, int]:
    newest: dict[str, int] = {}
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r0*(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, v in json.loads(f.read_text()).items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
                and not v.get("err")
            ):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def _hashes_at_rev(rev: str) -> dict[str, str]:
    wt = Path(f"/tmp/freshness_wt_{rev}")
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(wt), rev],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        out = subprocess.run(
            [sys.executable, str(REPO / "tools" / "freshness.py"),
             "--dump", "--repo", str(wt)],
            check=True, capture_output=True, text=True,
        )
        return json.loads(out.stdout)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=REPO, check=True, capture_output=True,
        )


def build_baseline() -> None:
    newest = newest_green_rounds(REPO)
    by_round: dict[int, list[str]] = {}
    for name, rnd in newest.items():
        by_round.setdefault(rnd, []).append(name)
    baseline: dict[str, dict] = {}
    for rnd, names in sorted(by_round.items()):
        rev = ROUND_REVS[rnd]
        hashes = _hashes_at_rev(rev)
        for name in names:
            if name in hashes:
                baseline[name] = {"round": rnd, "rev": rev, "hash": hashes[name]}
            else:
                # Renamed/removed since its green row — treat as unproven.
                baseline[name] = {"round": rnd, "rev": rev, "hash": None}
    out = REPO / "tools" / "window_freshness.json"
    out.write_text(json.dumps(baseline, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(baseline)} entries)")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dump", action="store_true")
    p.add_argument("--baseline", action="store_true")
    p.add_argument("--repo", default=str(REPO))
    args = p.parse_args()
    if args.dump:
        print(json.dumps(compute_hashes(Path(args.repo)), indent=1, sort_keys=True))
        return 0
    if args.baseline:
        build_baseline()
        return 0
    p.print_help()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
