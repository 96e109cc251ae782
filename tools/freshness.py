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

v1 limitation and the opt-in v2 mode: in v1 an intra-module helper
called by the fn but defined outside it is not hashed unless the
oracle captures it; the local 175-entry oracle gate covers such drift
behaviorally. ``--helpers`` (v2) closes it by also hashing the source
segments of every module-level workload definition the fn reaches by
name (transitively, across workload modules). v2 invalidates more
standing evidence than one driver window can re-prove (measured round
9: 83 entries, dominated by the r6/r7 ``load`` loader change), so the
checked-in baseline stays v1 until the round-10 rotation makes the
v2-stale cohort fit one window; the baseline records its mode in
``__meta__`` and CI follows it automatically.

Usage:
    python tools/freshness.py --dump [--repo DIR] [--helpers]
        Print one JSON object {entry: hash} for the tree at DIR
        (default: this repo).
    python tools/freshness.py --turnover
        One-command round-boundary fix: commit untracked driver
        artifacts under the exact driver subject, rebuild the ledger
        in its recorded mode, commit the rebuilt ledger.
    python tools/freshness.py --baseline [--helpers]
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

# Exact subject, not a prefix: a loose 'round N: verdict' match would
# let any later commit (e.g. 'round 8: verdict errata') silently
# re-pin a historical round's evidence tree (round-9 review finding).
_ROUND_SUBJECT = re.compile(
    r"^([0-9a-f]+) round (\d+): verdict/advice/correctness/bench$"
)


def _parse_round_revs(log_text: str) -> dict[int, str]:
    """Round -> verdict-commit rev from ``git log --format='%h %s'``
    output. Only the exact driver subject matches, and the OLDEST
    commit per round wins — the gate ran against the builder's
    end-of-round tree, which the round's FIRST verdict commit sits
    directly on; any later same-subject commit is not the evidence
    tree. Duplicates are reported so a deliberate re-pin goes through
    the explicit ROUND_REVS override, never silently."""
    out: dict[int, str] = {}
    for line in reversed(log_text.splitlines()):  # oldest first
        m = _ROUND_SUBJECT.match(line)
        if not m:
            continue
        rnd = int(m.group(2))
        if rnd in out:
            print(
                f"[freshness] WARNING: multiple 'round {rnd}: verdict...' "
                f"commits; keeping oldest {out[rnd]}, ignoring {m.group(1)} "
                "(use ROUND_REVS to override)",
                file=sys.stderr,
            )
            continue
        out[rnd] = m.group(1)
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


def _workload_family(dotted: str) -> bool:
    return dotted == "workload" or dotted.startswith("workload.")


class _ModuleIndex:
    """Per-workload-module helper resolution index: top-level
    definitions (name -> source segment) and the import map (local
    name -> (target module dotted, original name)). Backs the opt-in
    ``include_helpers`` hash mode, which closes v1's documented
    limitation: an intra-module helper (function, constant, CTE
    string) called by the entry fn but defined outside it was not
    hashed unless the materialized oracle captured it."""

    def __init__(self, pkg_root: Path):
        self.pkg_root = pkg_root
        self._cache: dict[str, tuple[dict, dict]] = {}
        self._src_cache: dict[tuple, tuple[set, dict, set]] = {}

    def get(self, dotted: str) -> tuple[dict, dict]:
        """dotted '' means the package-root __init__ (``from <pkg>
        import X`` / ``from .. import X`` out of a workload submodule)
        — distinct from 'workload', the workload package __init__
        (round-9 review finding)."""
        if dotted in self._cache:
            return self._cache[dotted]
        f = (
            self.pkg_root / "__init__.py"
            if dotted == ""
            else _module_file(self.pkg_root, dotted)
        )
        if f is None or not f.exists():
            self._cache[dotted] = ({}, {})
            return self._cache[dotted]
        text = f.read_text()
        tree = ast.parse(text)
        cur_pkg = _pkg_location(f, self.pkg_root)
        # defs: name -> (segment, lineno); imports: name -> (target
        # module, original name, lineno). Linenos let resolution honor
        # runtime binding order when a module both imports and defines
        # one name.
        defs: dict[str, tuple[str, int]] = {}
        imports: dict[str, tuple[str, str, int]] = {}
        # Own walker (unlike _module_level_nodes, which deliberately
        # DROPS def nodes): yields module-level def statements
        # themselves and descends through non-def blocks so guarded
        # assigns/imports under top-level try/if/with count too.
        nodes: list = []
        stack = list(tree.body)
        while stack:
            node = stack.pop()
            nodes.append(node)
            if not isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Lambda)
            ):
                stack.extend(
                    c
                    for c in ast.iter_child_nodes(node)
                    if isinstance(c, (ast.stmt, ast.ExceptHandler))
                )
        def put_def(name: str, node, seg: str) -> None:
            # Keep the LAST binding by source position (runtime wins —
            # round-9 review finding on def-after-import precedence).
            if name not in defs or node.lineno > defs[name][1]:
                defs[name] = (seg, node.lineno)

        for node in nodes:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                # Include decorators: @register(...)'s oracle/doc and
                # any behavior-wrapping decorator are part of a reached
                # helper's definition; ast.get_source_segment starts at
                # the def line and would drop them (round-9 review
                # finding).
                seg = "\n".join(
                    [ast.get_source_segment(text, d) or "" for d in node.decorator_list]
                    + [ast.get_source_segment(text, node) or ""]
                )
                put_def(node.name, node, seg)
            elif isinstance(node, ast.Assign):
                seg = ast.get_source_segment(text, node) or ""
                for t in node.targets:
                    for n in ast.walk(t):
                        if isinstance(n, ast.Name):
                            put_def(n.id, node, seg)
            elif (
                isinstance(node, ast.AnnAssign)
                and isinstance(node.target, ast.Name)
                and node.value is not None
            ):
                # A bare annotation (`x: T` without a value) binds
                # nothing at runtime — letting it win the last-binding
                # comparison would hash dead annotation text over the
                # live import/def (round-9 third-pass finding).
                put_def(node.target.id, node, ast.get_source_segment(text, node) or "")
            elif isinstance(node, ast.ImportFrom):
                self._add_from(node, cur_pkg, imports)
        self._cache[dotted] = (defs, imports)
        return self._cache[dotted]

    def _add_from(self, node: ast.ImportFrom, cur_pkg: list[str], out: dict) -> None:
        if node.level > 0:
            if node.level - 1 > len(cur_pkg):
                return
            base = cur_pkg[: len(cur_pkg) - (node.level - 1)]
            mod = ".".join(base + node.module.split(".")) if node.module else ".".join(base)
        elif node.module and node.module == PKG:
            mod = ""
        elif node.module and node.module.startswith(PKG + "."):
            mod = node.module[len(PKG) + 1 :]
        else:
            return  # third-party
        for a in node.names:
            # Last binding wins here too (the module walker and
            # ast.walk don't guarantee source order; guard with lineno
            # explicitly).
            prev = out.get(a.asname or a.name)
            if prev is None or node.lineno >= prev[2]:
                out[a.asname or a.name] = (mod, a.name, node.lineno)

    def analyze_src(
        self, src: str, src_pkg: tuple[str, ...]
    ) -> tuple[set, dict, set]:
        """(names used, import overlay, engine deps imported inside)
        for one source block — cached, and ONE ast.parse per cache
        miss (names, overlay, and engine imports all derive from the
        same tree)."""
        key = (src, src_pkg)
        hit = self._src_cache.get(key)
        if hit is not None:
            return hit
        try:
            tree = ast.parse(src)
        except SyntaxError:
            res: tuple[set, dict, set] = (set(), {}, set())
            self._src_cache[key] = res
            return res
        walked = list(ast.walk(tree))
        engine = {
            d
            for d in _imports_in_nodes(iter(walked), list(src_pkg))
            if _is_engine_dep(d) and _module_file(self.pkg_root, d)
        }
        overlay: dict[str, tuple[str, str, int]] = {}
        for node in walked:
            if isinstance(node, ast.ImportFrom):
                self._add_from(node, list(src_pkg), overlay)
        free, global_reads = _scope_free(tree.body, set())
        res = (free | global_reads, overlay, engine)
        self._src_cache[key] = res
        return res


def _names_used(src: str) -> set[str]:
    """Names whose Load may reach MODULE level: per-scope free-variable
    analysis, not a flat walk. A flat subtract is wrong in BOTH
    directions (round-9 review findings): counting locally-bound names
    spuriously folds shadowed module helpers into the hash (wasted
    driver-window slots), and subtracting scope-insensitively lets a
    lambda param / comprehension target suppress a genuine
    enclosing-scope read of a module helper (silent under-inclusion in
    a drift gate). Rules, biased toward over-inclusion when ambiguous:

    - per scope, bound = params, Store/Del targets, except-aliases,
      nested def/class names; loads of bound names stay local;
    - nested scopes: free names propagate outward minus each enclosing
      scope's bindings; decorators, default values, and the FIRST
      comprehension iterable evaluate in the ENCLOSING scope (Python
      semantics — keeps their loads from being eaten by inner params);
    - ``global X`` makes X a module read (and never locally bound),
      propagated to the top unsubtractable even when an enclosing
      function binds the same name; ``nonlocal X`` can never be a
      module read — excluded;
    - class scopes do NOT enclose their methods (Python semantics): a
      method's free names bypass class-attribute bindings;
    - import aliases are NOT treated as bound: they resolve through
      the import overlay instead."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return set()
    free, global_reads = _scope_free(tree.body, set())
    return free | global_reads


def _param_names(node) -> set[str]:
    a = node.args
    p = {arg.arg for arg in a.posonlyargs + a.args + a.kwonlyargs}
    p |= {arg.arg for arg in (a.vararg, a.kwarg) if arg}
    return p


def _function_free(node) -> tuple[set[str], set[str]]:
    """(free, global reads) of ONE function — decorators, defaults,
    annotations, body — WITHOUT binding the function's own name: a
    class-body method whose body calls a same-named module function
    reads the MODULE one (round-9 fourth-pass finding)."""
    f, g = _scope_free([node], set())
    body = node.body if isinstance(node.body, list) else [node.body]
    bf, _bg = _scope_free(body, _param_names(node))
    name = getattr(node, "name", None)
    if name and name in bf:
        f = f | {name}
    return f, g


def _scope_free(
    body, params: set[str], class_body: bool = False
) -> tuple[set[str], set[str]]:
    """(free names, global-declared reads) of one scope. The second
    set rides to the top WITHOUT being subtracted by enclosing
    bindings — ``def q(): CFG = 1; def inner(): global CFG`` reads the
    module CFG even though q binds CFG locally (round-9 third-pass
    finding).

    ``class_body``: Python class scopes do NOT enclose the functions
    defined in them — a method's free names must bypass
    class-attribute bindings (but remain subtractable by the scope
    CONTAINING the class: methods do close over enclosing function
    scopes). In class-body mode every function/lambda encountered at
    any statement depth (so also under ``if``/``try`` — round-9
    fourth-pass finding) is analyzed in isolation and its free names
    join the return value AFTER this scope's subtraction."""
    bound = set(params)
    loads: set[str] = set()
    inner_free: set[str] = set()
    bypass: set[str] = set()
    global_names: set[str] = set()
    global_reads_up: set[str] = set()
    nonlocal_names: set[str] = set()

    def recurse(sub_body, sub_params: set[str], cb: bool = False) -> set[str]:
        f, g = _scope_free(sub_body, sub_params, class_body=cb)
        global_reads_up.update(g)
        return f

    def enter_function(node) -> None:
        # Decorators / defaults / annotations evaluate HERE.
        for d in getattr(node, "decorator_list", []):
            handle(d)
        a = node.args
        for dflt in list(a.defaults) + [d for d in a.kw_defaults if d]:
            handle(dflt)
        for arg in a.posonlyargs + a.args + a.kwonlyargs + [
            x for x in (a.vararg, a.kwarg) if x
        ]:
            if arg.annotation:
                handle(arg.annotation)
        if getattr(node, "returns", None):
            handle(node.returns)
        inner_free.update(
            recurse(
                node.body if isinstance(node.body, list) else [node.body],
                _param_names(node),
            )
        )

    def enter_comprehension(node) -> None:
        # The first iterable evaluates HERE; targets/ifs/elt and
        # later iterables in the comprehension's own scope —
        # recurse through _scope_free so nested lambdas and
        # comprehensions inside get the same precise treatment.
        # Comprehension scopes are FUNCTION scopes: in class-body mode
        # their free names must bypass class-attribute bindings exactly
        # like methods do (only the first iterable sees the class
        # scope — round-10 ADVICE finding: `class A: helper = 1;
        # vals = [helper(v) for v in rows]` reads the MODULE helper).
        handle(node.generators[0].iter)
        comp_params = {
            n.id
            for g in node.generators
            for n in ast.walk(g.target)
            if isinstance(n, ast.Name)
        }
        rest = [e for g in node.generators for e in g.ifs]
        rest += [g.iter for g in node.generators[1:]]
        rest += (
            [node.key, node.value]
            if isinstance(node, ast.DictComp)
            else [node.elt]
        )
        if class_body:
            f, g = _scope_free(rest, comp_params)
            bypass.update(f)
            global_reads_up.update(g)
        else:
            inner_free.update(recurse(rest, comp_params))

    def handle(c) -> None:
        if isinstance(c, (ast.FunctionDef, ast.AsyncFunctionDef)):
            bound.add(c.name)
            if class_body:
                # Class scopes do not enclose their methods: analyze
                # in isolation; free names join via the bypass channel
                # (not subtracted by class-attribute bindings).
                f, g = _function_free(c)
                bypass.update(f)
                global_reads_up.update(g)
            else:
                enter_function(c)
        elif isinstance(c, ast.Lambda):
            if class_body:
                f, g = _function_free(c)
                bypass.update(f)
                global_reads_up.update(g)
            else:
                enter_function(c)
        elif isinstance(c, ast.ClassDef):
            bound.add(c.name)
            for d in c.decorator_list:
                handle(d)
            for b in list(c.bases) + list(c.keywords):
                handle(b)
            # The class body runs in class-body mode: its own
            # statements see class attributes, while functions at any
            # statement depth inside it bypass them (round-9 third- and
            # fourth-pass findings).
            inner_free.update(recurse(c.body, set(), cb=True))
        elif isinstance(
            c, (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)
        ):
            enter_comprehension(c)
        elif isinstance(c, ast.Global):
            global_names.update(c.names)
        elif isinstance(c, ast.Nonlocal):
            nonlocal_names.update(c.names)
        else:
            if isinstance(c, ast.Name):
                (loads if isinstance(c.ctx, ast.Load) else bound).add(c.id)
            elif isinstance(c, ast.ExceptHandler) and c.name:
                bound.add(c.name)
            for sub in ast.iter_child_nodes(c):
                handle(sub)

    for stmt in body:
        handle(stmt)
    bound -= global_names
    free = (loads - bound) | (inner_free - bound) | global_names
    # bypass joins AFTER this scope's subtraction (class-body mode);
    # the enclosing scope still subtracts its own bindings from it.
    # The global-reads channel is NOT filtered by nonlocal_names:
    # global and nonlocal cannot coexist for one name in one scope, so
    # the only effect of subtracting would be wrongly erasing an inner
    # scope's `global X` read when THIS scope declares X nonlocal
    # (round-9 fourth-pass finding).
    return (free - nonlocal_names) | bypass, global_names | global_reads_up


def _helper_closure(
    fn_name: str, fn_src: str, mod_dotted: str, cur_pkg: list[str], idx: _ModuleIndex
) -> tuple[list[str], set[str]]:
    """(hash parts, engine deps) for the entry fn's helper closure.

    Hash parts: sorted ``module:name\\x00segment`` for every
    module-level workload-family definition the fn reaches by name —
    transitively through helpers and through ``from .sibling import
    helper`` re-exports. Engine deps: first-party non-workload modules
    imported INSIDE any reached helper segment (e.g. ``from ..plans
    import materialize_once`` in a helper body) — v1's dep closure
    only sees the entry fn and module top level, so without feeding
    these back an engine edit reached solely through a helper would
    escape the hash (round-9 review finding, confirmed live on
    ``_materialized_edges``/``_resolve_sf_dir``)."""
    out: dict[tuple[str, str], str] = {}
    engine_deps: set[str] = set()
    visited: set[tuple[str, str]] = set()  # resolved DEF targets

    def resolve(mod: str, name: str, overlay: dict) -> tuple[str, str] | None:
        """Follow import chains to the defining (module, name), or None
        for unresolvable / module-object / engine targets (engine
        targets are recorded as deps). Keyed by TARGET, not usage site:
        the same local name may resolve differently via a segment
        overlay vs the module import map (round-9 review finding)."""
        hops: set[tuple[str, str]] = set()
        while True:
            if (mod, name) in hops:
                return None
            hops.add((mod, name))
            defs, imports = idx.get(mod)
            # A fn-local import (overlay) rebinds for the whole block;
            # at module level the LAST binding wins, so compare the
            # import's and the def's source positions (round-9 review
            # finding: import-over-def regardless of order hashed the
            # dead binding).
            tgt = overlay.get(name)
            if tgt is None:
                imp, dfn = imports.get(name), defs.get(name)
                if imp is not None and (dfn is None or imp[2] > dfn[1]):
                    tgt = imp
                elif dfn is not None:
                    return (mod, name)
                else:
                    return None
            overlay = {}  # the segment overlay applies to the first hop only
            tmod, oname = tgt[0], tgt[1]
            if not (_workload_family(tmod) or tmod == ""):
                engine_deps.add(tmod)
                return None
            # '' = package ROOT __init__, kept distinct from the
            # workload package __init__ ('workload').
            sub = f"{tmod}.{oname}" if tmod else oname
            if _module_file(idx.pkg_root, sub):
                # Binds a MODULE object, not a name: engine submodules
                # are v1-dep territory; whole workload registries stay
                # excluded by design.
                if _is_engine_dep(sub):
                    engine_deps.add(sub)
                return None
            mod, name = tmod, oname

    def scan(src: str, mod: str, src_pkg: list[str]) -> None:
        # One parse per distinct source block: names/overlay/engine
        # imports are cached on the index (round-9 review finding —
        # shared segments like workload:load were re-parsed for every
        # one of the 175 entries).
        names, overlay, seg_engine = idx.analyze_src(src, tuple(src_pkg))
        engine_deps.update(seg_engine)
        for used in names:
            tgt = resolve(mod, used, overlay)
            if tgt is None or tgt in visited:
                continue
            visited.add(tgt)
            tmod, tname = tgt
            seg = idx.get(tmod)[0][tname][0]
            out[tgt] = seg
            if tmod == "":
                seg_pkg: list[str] = []
            else:
                f = _module_file(idx.pkg_root, tmod)
                seg_pkg = _pkg_location(f, idx.pkg_root) if f else src_pkg
            scan(seg, tmod, seg_pkg)

    visited.add((mod_dotted, fn_name))
    scan(fn_src, mod_dotted, cur_pkg)
    parts = [f"{m}:{n}\x00{s}" for (m, n), s in sorted(out.items())]
    return parts, engine_deps


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


def compute_hashes(repo: Path, include_helpers: bool = False) -> dict[str, str]:
    """Entry-definition hashes. ``include_helpers`` (v2 mode) folds in
    the source segments of every module-level workload helper the fn
    reaches by name (see _helper_closure). v2 is strictly stricter —
    measured round 9: it invalidates 83 entries' pre-existing evidence
    (the shared ``load``/``_resolve_sf_dir`` loader changed in r6/r7,
    flipping ALL pre-r7 evidence at once), more than one 50-slot
    driver window can re-prove — so the checked-in baseline stays v1
    until round 10, when the remaining v2-stale cohort (~33 entries)
    fits a single window and CI can switch via --baseline --helpers
    (the baseline records its mode in "__meta__" and the CI test
    follows it)."""
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
    idx = _ModuleIndex(pkg_root) if include_helpers else None
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
        helper_parts: list[str] = []
        if idx is not None:
            mod_dotted = ".".join(
                mod_file.relative_to(pkg_root).with_suffix("").parts
            ).removesuffix(".__init__")
            helper_parts, helper_engine_deps = _helper_closure(
                fn.__name__, src, mod_dotted, cur_pkg, idx
            )
            # Engine modules imported only inside helper bodies join
            # the transitive dep closure (round-9 review finding).
            direct |= helper_engine_deps
        deps = _transitive_deps(direct, pkg_root)
        parts = [src, spec.oracle or ""]
        parts += [f"{d}\x00{module_src(d)}" for d in sorted(deps)]
        parts += helper_parts
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


_ARTIFACT_GLOBS = (
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "VERDICT.md",
    "ADVICE.md",
)


def _parse_porcelain_z(stdout: str) -> list[str]:
    """Paths from ``git status --porcelain=v1 -z`` output.

    NUL-delimited parsing instead of line slicing: quoted paths are
    never emitted in -z mode, and rename/copy entries ("R"/"C" status)
    carry the ORIGINAL path as a separate NUL field that must be
    skipped — naive ``ln[3:]`` would yield the bogus "old -> new"
    composite (round-15 advice)."""
    fields = stdout.split("\0")
    paths: list[str] = []
    i = 0
    while i < len(fields):
        ent = fields[i]
        i += 1
        if len(ent) < 4:
            continue
        xy, path = ent[:2], ent[3:]
        if xy[0] in "RC":
            i += 1  # consume the rename/copy source field
        paths.append(path)
    return paths


def _dirty_artifacts(repo: Path = REPO) -> list[str]:
    """Round artifact files the driver dropped that git does not yet
    track (or tracks with modifications)."""
    r = subprocess.run(
        ["git", "status", "--porcelain=v1", "-z", "--", *_ARTIFACT_GLOBS],
        cwd=repo,
        capture_output=True,
        text=True,
    )
    return _parse_porcelain_z(r.stdout)


def uncommitted_driver_artifacts(repo: Path = REPO) -> list[str]:
    """CORRECTNESS_r*.json files present on disk but not yet committed
    — the marker of the DESIGNED round-boundary state. When this is
    non-empty, a stale freshness ledger is process sequencing (the
    rebuild needs the round's commit for its worktree), never an
    engine regression; CI treats it as a skip, not a failure
    (round-15 verdict item #1)."""
    r = subprocess.run(
        ["git", "status", "--porcelain=v1", "-z", "--", "CORRECTNESS_r*.json"],
        cwd=repo,
        capture_output=True,
        text=True,
    )
    return _parse_porcelain_z(r.stdout)


def _turnover_plan(
    dirty: list[str], log_text: str, rounds_on_disk: list[int]
) -> tuple[int | None, str | None]:
    """(round, commit subject) for the artifact-commit step of
    --turnover, as a pure decision so tests can exercise it without a
    repo. Returns (None, None) when there is nothing to commit.
    Raises SystemExit when the exact driver subject for the detected
    round already exists in the log — committing a duplicate would
    NOT re-pin the evidence tree (oldest wins in _parse_round_revs),
    so the situation needs a human ROUND_REVS decision, never a silent
    second commit."""
    if not dirty:
        return None, None
    dirty_rounds = [
        int(m.group(1))
        for f in dirty
        if (m := re.search(r"CORRECTNESS_r0*(\d+)\.json$", f))
    ]
    rnd = max(dirty_rounds) if dirty_rounds else (
        max(rounds_on_disk) if rounds_on_disk else None
    )
    if rnd is None:
        raise SystemExit(
            f"--turnover: dirty artifacts {dirty} but no CORRECTNESS_r*.json "
            "on disk to infer the round from — commit them manually."
        )
    if rnd in _parse_round_revs(log_text):
        raise SystemExit(
            f"--turnover: a 'round {rnd}: verdict/advice/correctness/bench' "
            f"commit already exists, yet {dirty} are dirty. A duplicate "
            "subject would be ignored by the evidence-tree resolver "
            "(oldest wins) — commit these by hand and, if the evidence "
            "tree moved, add an explicit ROUND_REVS override."
        )
    return rnd, f"round {rnd}: verdict/advice/correctness/bench"


def turnover() -> int:
    """One-command round-boundary fix (round-14 verdict item #2).

    The designed round-boundary red — the driver drops
    CORRECTNESS_r{N}.json/BENCH_r{N}.json and the checked-in freshness
    ledger predates them — recurred as a manual three-step prescription
    in five consecutive verdicts (r10–r14). This automates it:

      1. if round artifacts are untracked/modified, commit them under
         the EXACT driver subject ``round N: verdict/advice/
         correctness/bench`` (the ledger rebuild resolves each round's
         evidence tree from that subject);
      2. rebuild tools/window_freshness.json in the ledger's recorded
         hash mode;
      3. if the ledger changed, commit it.

    Idempotent: on a clean, current tree it reports nothing-to-do and
    exits 0.
    """
    ledger = REPO / "tools" / "window_freshness.json"
    # Missing-ledger bootstrap uses the same absent-__meta__ default
    # (False/v1) as every read path in this file — a divergent default
    # here would rebuild in a hash mode --drift/--check don't expect
    # (round-15 advice).
    mode = False
    before: str | None = None
    if ledger.exists():
        before = ledger.read_text()
        mode = json.loads(before).get("__meta__", {}).get("helpers", False)

    def git(*args: str) -> None:
        r = subprocess.run(
            ["git", *args], cwd=REPO, capture_output=True, text=True
        )
        if r.returncode != 0:
            raise SystemExit(
                f"git {' '.join(args)} failed (rc={r.returncode}):\n{r.stderr}"
            )

    # The commits below use explicit pathspecs, so a dirty WORKING TREE
    # elsewhere is fine — but `git commit -- <paths>` still refuses odd
    # index states and, more importantly, the round's evidence tree
    # must contain exactly the artifacts plus whatever was already
    # committed, never unrelated half-staged engine edits (round-15
    # advice: a polluted evidence tree defeats the drift detection
    # this ledger exists for).
    staged = subprocess.run(
        ["git", "diff", "--cached", "--quiet"], cwd=REPO
    )
    if staged.returncode != 0:
        raise SystemExit(
            "--turnover: the git index has staged changes unrelated to "
            "this command. Commit or unstage them first — the round's "
            "evidence commit must not absorb them."
        )

    log = subprocess.run(
        ["git", "log", "--format=%h %s"], cwd=REPO, capture_output=True, text=True
    )
    rounds_on_disk = [
        int(m.group(1))
        for f in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"r0*(\d+)", f.name))
    ]
    dirty = _dirty_artifacts(REPO)
    rnd, subject = _turnover_plan(dirty, log.stdout, rounds_on_disk)
    if subject is not None:
        git("add", "--", *dirty)
        # Pathspec commit: only the artifact files enter the evidence
        # tree even if something else were staged (belt to the index
        # guard's suspenders).
        git("commit", "-m", subject, "--", *dirty)
        print(f"[turnover] committed {len(dirty)} artifact(s): {subject!r}")
    build_baseline(include_helpers=mode)
    after = ledger.read_text()
    if after != before:
        tag = f"round {rnd}" if rnd is not None else "current"
        git("add", "--", str(ledger))
        git(
            "commit",
            "-m",
            f"Rebuild freshness ledger against {tag} artifacts",
            "--",
            str(ledger),
        )
        print("[turnover] committed rebuilt tools/window_freshness.json")
    if subject is None and after == before:
        print("[turnover] nothing to do: artifacts committed, ledger current")
    return 0


def stale_ledger_diagnosis(
    stale: dict, include_helpers: bool, repo: Path = REPO
) -> str:
    """Actionable failure text for a baseline-vs-artifacts mismatch.

    Two distinct states produce a stale ledger, and the CI gate must
    not let one masquerade as the other (round-10 verdict item):

    - The DESIGNED round-boundary state: the driver just wrote a new
      ``CORRECTNESS_r*.json`` that is still untracked/uncommitted, so
      the ledger rebuild (which needs the round's verdict commit for
      its worktree) cannot have run yet. This is process sequencing,
      not an engine regression, and the message says so explicitly
      with the exact three-step fix.
    - A genuinely out-of-date committed ledger (someone committed new
      artifacts but skipped the rebuild): the message names the rebuild
      command in the baseline's recorded hash mode.
    """
    cmd = "python tools/freshness.py --baseline" + (
        " --helpers" if include_helpers else ""
    )
    dirty = uncommitted_driver_artifacts(repo)
    if dirty:
        rounds = sorted({rec[1] for rec in stale.values()})
        return (
            "LEDGER STALE — designed round-boundary state, NOT an "
            f"engine regression. New driver artifact(s) {dirty} are "
            "not yet committed, so tools/window_freshness.json "
            "predates them (the rebuild needs the round's commit for "
            "its per-round worktree). Fix with ONE command: "
            "`python tools/freshness.py --turnover` — it commits the "
            "round's artifacts under the exact subject 'round N: "
            "verdict/advice/correctness/bench', rebuilds the ledger "
            f"(`{cmd}`), and commits the result. "
            f"({len(stale)} entries affected; newest green rounds "
            f"involved: {rounds})"
        )
    return (
        "window_freshness.json is out of date vs the committed "
        "CORRECTNESS_r*.json ledger (entry: baseline round vs newest "
        f"green round): {stale} — run "
        f"`python tools/freshness.py --turnover` (rebuilds via `{cmd}` "
        "and commits the result)."
    )


def _hashes_at_rev(rev: str, include_helpers: bool = False) -> dict[str, str]:
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
        cmd = [sys.executable, str(REPO / "tools" / "freshness.py"),
               "--dump", "--repo", str(wt)]
        if include_helpers:
            cmd.append("--helpers")
        return json.loads(run(cmd).stdout)
    finally:
        run(["git", "worktree", "remove", "--force", str(wt)], cwd=REPO)
        import shutil

        shutil.rmtree(wt.parent, ignore_errors=True)


def _require_revs(rounds, revs: dict[int, str], context: str) -> None:
    missing = sorted(set(rounds) - set(revs))
    if missing:
        raise SystemExit(
            f"no git rev resolvable for {context} round(s) {missing} — "
            "the round's `round N: verdict/advice/correctness/bench` "
            "commit is not in the log (not yet committed?); commit it "
            "or add an explicit override to ROUND_REVS in "
            "tools/freshness.py, then rerun."
        )


def build_baseline(include_helpers: bool = False) -> None:
    newest = newest_green_rounds(REPO)
    by_round: dict[int, list[str]] = {}
    for name, rnd in newest.items():
        by_round.setdefault(rnd, []).append(name)
    revs = round_revs()
    _require_revs(by_round, revs, "green")
    baseline: dict[str, dict] = {
        # The CI test recomputes current hashes in the SAME mode the
        # baseline was built with (sort_keys puts __meta__ first).
        "__meta__": {"helpers": include_helpers},
    }
    for rnd, names in sorted(by_round.items()):
        rev = revs[rnd]
        hashes = _hashes_at_rev(rev, include_helpers)
        for name in names:
            if name in hashes:
                baseline[name] = {"round": rnd, "rev": rev, "hash": hashes[name]}
            else:
                # Renamed/removed since its green row — treat as unproven.
                baseline[name] = {"round": rnd, "rev": rev, "hash": None}
    out = REPO / "tools" / "window_freshness.json"
    out.write_text(json.dumps(baseline, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(baseline) - 1} entries, helpers={include_helpers})")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dump", action="store_true")
    p.add_argument("--baseline", action="store_true")
    p.add_argument(
        "--helpers",
        action="store_true",
        help="v2 hash mode: also fold in the source segments of every "
        "module-level workload helper the entry fn reaches by name "
        "(see compute_hashes docstring for the round-10 switch plan)",
    )
    p.add_argument(
        "--drift",
        action="store_true",
        help="report entries whose CURRENT definition hash differs from "
        "the checked-in baseline (window-rotation planning). Hash mode: "
        "the baseline's recorded __meta__ mode, or --helpers to preview "
        "drift under v2 before switching the ledger.",
    )
    p.add_argument(
        "--turnover",
        action="store_true",
        help="one-command round-boundary fix: commit untracked driver "
        "artifacts under the exact driver subject, rebuild the ledger "
        "in its recorded hash mode, commit the rebuilt ledger. "
        "Idempotent on a clean tree.",
    )
    p.add_argument("--repo", default=str(REPO))
    args = p.parse_args()
    if args.turnover:
        return turnover()
    if args.drift:
        baseline = json.loads((REPO / "tools" / "window_freshness.json").read_text())
        base_mode = baseline.get("__meta__", {}).get("helpers", False)
        mode = args.helpers or base_mode
        current = compute_hashes(Path(args.repo), include_helpers=mode)
        if mode != base_mode:
            # Previewing a different hash mode: the baseline's recorded
            # hashes are incomparable — recompute each entry's hash at
            # its green-round tree in the REQUESTED mode (worktree per
            # round, like --baseline does). Slower but apples-to-apples.
            by_round: dict[int, list[str]] = {}
            for name, rec in baseline.items():
                if name != "__meta__":
                    by_round.setdefault(rec["round"], []).append(name)
            revs = round_revs()
            _require_revs(by_round, revs, "baseline")
            green_hashes: dict[str, str | None] = {}
            for rnd, names in sorted(by_round.items()):
                at_rev = _hashes_at_rev(revs[rnd], include_helpers=mode)
                for n in names:
                    green_hashes[n] = at_rev.get(n)
        else:
            green_hashes = {
                n: rec["hash"] for n, rec in baseline.items() if n != "__meta__"
            }
        out = {}
        for name, h in sorted(current.items()):
            rec = baseline.get(name)
            if rec is None:
                out[name] = {"why": "no baseline record"}
            elif green_hashes.get(name) is None:
                out[name] = {"why": f"unresolvable at green r{rec['round']}",
                             "round": rec["round"], "rev": rec["rev"]}
            elif green_hashes[name] != h:
                out[name] = {"why": "drifted", "round": rec["round"], "rev": rec["rev"]}
        print(json.dumps({"mode_helpers": mode, "n": len(out), "entries": out}, indent=1))
        return 0
    if args.dump:
        print(
            json.dumps(
                compute_hashes(Path(args.repo), include_helpers=args.helpers),
                indent=1,
                sort_keys=True,
            )
        )
        return 0
    if args.baseline:
        build_baseline(include_helpers=args.helpers)
        return 0
    p.print_help()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
