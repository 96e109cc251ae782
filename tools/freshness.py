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
# contents are identical to what the gate imported). Derived from the
# git log automatically — every round boundary lands as a commit whose
# subject starts "round N: verdict" — so a new round needs no manual
# edit here. ROUND_REVS holds explicit OVERRIDES only (e.g. if a
# round's gate ran against a tree other than its verdict commit).
ROUND_REVS: dict[int, str] = {
    # round 6 was void (wiped testdata) — no entry's newest green is 6,
    # so its derived rev is never dereferenced.
}

_ROUND_SUBJECT = re.compile(r"^([0-9a-f]+) round (\d+): verdict")


def _parse_round_revs(log_text: str) -> dict[int, str]:
    """Newest 'round N: verdict...' commit per round from ``git log
    --format='%h %s'`` output (newest-first, so first hit wins)."""
    out: dict[int, str] = {}
    for line in log_text.splitlines():
        m = _ROUND_SUBJECT.match(line)
        if m and int(m.group(2)) not in out:
            out[int(m.group(2))] = m.group(1)
    return out


def round_revs() -> dict[int, str]:
    r = subprocess.run(
        ["git", "log", "--format=%h %s"],
        cwd=REPO, capture_output=True, text=True,
    )
    if r.returncode != 0:
        raise SystemExit(f"git log failed (rc={r.returncode}):\n{r.stderr}")
    derived = _parse_round_revs(r.stdout)
    derived.update(ROUND_REVS)
    return derived

def _module_file(pkg_root: Path, dotted: str) -> Path | None:
    """``operators.dedup`` -> operators/dedup.py or operators/dedup/__init__.py."""
    rel = dotted.replace(".", "/")
    for cand in (pkg_root / f"{rel}.py", pkg_root / rel / "__init__.py"):
        if cand.exists():
            return cand
    return None


def _imports_in_nodes(nodes, cur_pkg: list[str]) -> set[str]:
    """Package-relative dotted names of first-party modules imported by
    the given AST nodes, resolved from ALL import forms: relative
    ``from ..X.Y import`` / ``from .X import`` / ``from .. import X``
    (level arithmetic against ``cur_pkg``, the importing module's
    package location), and absolute ``from <pkg>.X import`` /
    ``import <pkg>.X`` / ``from <pkg> import X``. Names that do not
    resolve to a module file under the package (e.g. ``from . import
    load`` — a function) are dropped downstream via _module_file."""
    out: set[str] = set()

    def add_from(mod: str | None, names) -> None:
        # The imported names may themselves be modules (``from
        # <pkg>.operators import flatten``) — emit both the module and
        # each module.name candidate; names that are mere functions
        # don't resolve to files and drop out at the _module_file
        # filter downstream.
        if mod:
            out.add(mod)
            out.update(f"{mod}.{a.name}" for a in names)
        else:
            out.update(a.name for a in names)

    for node in nodes:
        if isinstance(node, ast.ImportFrom):
            if node.level > 0:
                if node.level - 1 > len(cur_pkg):
                    continue  # escapes the package root — not first-party
                base = cur_pkg[: len(cur_pkg) - (node.level - 1)]
                mod = ".".join(base + node.module.split(".")) if node.module else (
                    ".".join(base) if base else None
                )
                if node.module or base:
                    add_from(mod, node.names)
                else:  # from <root> import X — X must be a module
                    out.update(a.name for a in node.names)
            elif node.module:
                if node.module == PKG:
                    out.update(a.name for a in node.names)
                elif node.module.startswith(PKG + "."):
                    add_from(node.module[len(PKG) + 1 :], node.names)
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG + "."):
                    out.add(a.name[len(PKG) + 1 :])
    return {d for d in out if d}


def _pkg_location(module_path: Path, pkg_root: Path) -> list[str]:
    """The package a module's relative imports resolve against: for
    x/y.py the containing package ['x']; for x/__init__.py the package
    itself ['x'] (both are ``rel.parts[:-1]``)."""
    return list(module_path.relative_to(pkg_root).parts[:-1])


def _is_engine_dep(dotted: str) -> bool:
    """Workload modules are registries of MANY entries (and import each
    other for shared helpers); hashing a whole sibling registry into an
    entry's definition would flip ~all entries on every unrelated edit.
    Per-entry workload drift is already captured by the fn source and
    the materialized oracle string (which embeds any cross-module
    oracle composition), so the dep closure covers engine modules
    only. Cross-module Spark-side helper calls remain the documented
    intra-registry limitation, covered behaviorally by the local
    175-entry gate."""
    return dotted != "workload" and not dotted.startswith("workload.")


def _transitive_deps(direct: set[str], pkg_root: Path) -> set[str]:
    """Close the dep set over first-party imports: an entry depending
    on operators/dedup.py also depends on everything dedup.py imports
    (e.g. plans.materialize_once) — a semantic fix there changes the
    entry's behavior just as surely. Round 8's review caught that the
    direct-only hash left this gap open."""
    seen: set[str] = set()
    frontier = {d for d in direct if _is_engine_dep(d) and _module_file(pkg_root, d)}
    while frontier:
        dep = frontier.pop()
        if dep in seen:
            continue
        seen.add(dep)
        f = _module_file(pkg_root, dep)
        if f is None:
            continue
        tree = ast.parse(f.read_text())
        for sub in _imports_in_nodes(ast.walk(tree), _pkg_location(f, pkg_root)):
            if sub not in seen and _is_engine_dep(sub) and _module_file(pkg_root, sub):
                frontier.add(sub)
    return seen


def _module_level_nodes(tree: ast.Module) -> list[ast.stmt]:
    """Every node at module level, descending through top-level Try /
    If / With blocks but NOT into function or class bodies — so a
    guarded ``try: from ..operators import x`` counts as a module-level
    import (round-8 ADVICE: ``tree.body`` alone missed those) while
    imports inside sibling functions stay per-entry."""
    out: list = []

    def visit(node) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(
                child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Lambda)
            ):
                continue
            out.append(child)
            visit(child)

    visit(tree)
    return out


def compute_hashes(repo: Path) -> dict[str, str]:
    repo = repo.resolve()
    # inspect.getsource reads from the module ALREADY in sys.modules; if
    # the package was imported from a different tree, fn sources would
    # come from that tree while dep-module sources are read from
    # ``repo`` — a silently mixed hash (round-8 ADVICE). Callers wanting
    # another tree must use the ``--dump --repo`` subprocess path.
    loaded = sys.modules.get(PKG)
    if loaded is not None:
        loaded_root = Path(loaded.__file__).resolve().parent.parent
        if loaded_root != repo:
            raise RuntimeError(
                f"{PKG} is already imported from {loaded_root}, not {repo} — "
                "compute_hashes would mix trees; run "
                f"`{sys.executable} tools/freshness.py --dump --repo {repo}` "
                "in a subprocess instead."
            )
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
        cur_pkg = _pkg_location(mod_file, pkg_root)
        if mod_key not in module_imports:
            # Module TOP-LEVEL imports apply to every entry the module
            # defines; imports inside OTHER functions of the module do
            # not (per-entry precision — a dep used only by a sibling
            # query must not flip this entry's hash). "Top level"
            # includes guarded imports under module-level Try/If.
            tree = ast.parse(mod_file.read_text())
            module_imports[mod_key] = _imports_in_nodes(
                _module_level_nodes(tree), cur_pkg
            )
        direct = set(module_imports[mod_key])
        # Imports anywhere inside THIS entry's function (any form —
        # full AST walk of the fn source, not a regex).
        direct |= _imports_in_nodes(ast.walk(ast.parse(src)), cur_pkg)
        # Harness names that do not resolve to module files (e.g.
        # `from . import load, register`) drop out inside the closure.
        deps = _transitive_deps(direct, pkg_root)
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
    import tempfile

    # Fresh dir per call: a fixed path would collide with leftovers
    # from a killed prior run (git refuses to add over a registered
    # worktree) or a concurrent one.
    wt = Path(tempfile.mkdtemp(prefix=f"freshness_wt_{rev}_")) / "tree"

    def run(cmd, **kw):
        r = subprocess.run(cmd, capture_output=True, text=True, **kw)
        if r.returncode != 0:
            raise SystemExit(
                f"{' '.join(cmd)} failed (rc={r.returncode}):\n{r.stderr}"
            )
        return r

    run(["git", "worktree", "add", "--detach", str(wt), rev], cwd=REPO)
    try:
        out = run(
            [sys.executable, str(REPO / "tools" / "freshness.py"),
             "--dump", "--repo", str(wt)],
        )
        return json.loads(out.stdout)
    finally:
        run(["git", "worktree", "remove", "--force", str(wt)], cwd=REPO)
        import shutil

        shutil.rmtree(wt.parent, ignore_errors=True)


def build_baseline() -> None:
    newest = newest_green_rounds(REPO)
    by_round: dict[int, list[str]] = {}
    for name, rnd in newest.items():
        by_round.setdefault(rnd, []).append(name)
    revs = round_revs()
    missing = sorted(set(by_round) - set(revs))
    if missing:
        raise SystemExit(
            f"no git rev resolvable for green round(s) {missing} — the "
            "round's `round N: verdict...` commit is not in the log "
            "(not yet committed?); commit it or add an explicit "
            "override to ROUND_REVS in tools/freshness.py, then rerun "
            "--baseline."
        )
    baseline: dict[str, dict] = {}
    for rnd, names in sorted(by_round.items()):
        rev = revs[rnd]
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
