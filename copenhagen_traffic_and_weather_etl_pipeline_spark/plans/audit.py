"""Physical-plan graph analysis for the scale lint.

Parses Spark's ``formatted`` explain output into a node tree and
classifies the scale-relevant structures:

- which node CONSUMES each single-partition exchange (a final scalar
  aggregate over partials is fine; a Sort+Window over fact rows is the
  classic funnel),
- whether a BroadcastNestedLoopJoin's broadcast side is a scalar
  aggregate frame (the fold-the-max-in-as-a-1-row-broadcast pattern)
  or something genuinely unbounded.

Shared by ``tools/plan_audit.py`` (repo-wide lint) and
``tests/test_plan_quality.py`` (hand gates).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class PlanNode:
    node_id: int
    name: str
    depth: int
    parent: "PlanNode | None" = None
    children: list["PlanNode"] = field(default_factory=list)
    details: str = ""


_TREE_RE = re.compile(r"([A-Za-z][A-Za-z0-9]*(?: [A-Za-z][A-Za-z0-9]*)*) \((\d+)\)\s*$")
_DETAIL_RE = re.compile(r"^\((\d+)\) ([A-Za-z][A-Za-z0-9 ]*)", re.MULTILINE)


def parse_formatted_plan(plan: str) -> dict[int, PlanNode]:
    """Build the operator tree from ``explainString(..., 'formatted')``.

    Parses EVERY tree-like section — the main physical plan AND each
    subquery plan under ``===== Subqueries =====`` — so antipatterns
    hiding inside scalar/IN subqueries are visible to the lint. Node
    ids are globally unique across the formatted output (Spark
    continues the numbering into subquery plans), so one id->node map
    covers everything.
    """
    sections = plan.split("\n\n")
    nodes: dict[int, PlanNode] = {}
    for sec in sections:
        stripped = sec.strip()
        if _DETAIL_RE.match(stripped):
            continue  # details block, handled below
        stack: list[PlanNode] = []
        for line in sec.splitlines():
            m = _TREE_RE.search(line)
            if not m:
                continue
            name = m.group(1).strip()
            depth = line.index(m.group(1).split(" ")[0])
            node = PlanNode(int(m.group(2)), name, depth)
            while stack and stack[-1].depth >= depth:
                stack.pop()
            if stack:
                node.parent = stack[-1]
                stack[-1].children.append(node)
            stack.append(node)
            nodes[node.node_id] = node
    # Attach details blocks ("(id) NodeName\nArguments: ...").
    for sec in sections:
        dm = _DETAIL_RE.match(sec.strip())
        if dm:
            nid = int(dm.group(1))
            if nid in nodes:
                nodes[nid].details += sec
    return nodes


def _subtree(node: PlanNode):
    yield node
    for c in node.children:
        yield from _subtree(c)


# Single-child operators that never INCREASE row count: the funneled
# row volume crossing an exchange is bounded by whatever sits below a
# chain of these. Anything not listed (Generate/explode, Expand, any
# join, union) can multiply rows and conservatively ends the walk.
_ROW_BOUNDED_OPS = {
    "Project",
    "Filter",
    "Sort",
    "Exchange",
    "AQEShuffleRead",
    "Coalesce",
    "Window",
    "WindowGroupLimit",
    "ColumnarToRow",
    "InputAdapter",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalLimit",
}
_AGG_OPS = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}


def _funnel_input_is_preaggregate(exchange: PlanNode) -> bool:
    """True iff every row entering ``exchange`` provably passed through
    an aggregate with no row-multiplying operator in between.

    This is the machine-checkable half of the standing "unpartitioned
    window runs over a pre-aggregate" justification: walk DOWN from the
    exchange through row-preserving/reducing single-child operators; if
    an aggregate is reached first, the funneled volume is
    aggregate-bounded. Precisely: the first aggregate below a shuffle
    exchange is typically the PARTIAL aggregate, whose output is
    bounded by groups × upstream-partitions, not bare group
    cardinality — still spine/histogram/bucket-sized times a constant
    factor (the shuffle-partition count), never the fact table
    (round-14 ADVICE: the claim here is "aggregate-bounded", not "one
    row per group"). Hitting a scan, a join, a Generate/Expand, or any
    unrecognized operator first means raw (or multiplied) rows funnel —
    the strictly stronger flag. WHY the group cardinality is bounded
    (calendar domain, value histogram, N/bucket_size) still needs the
    per-query prose justification; this check eliminates the half that
    used to live only in prose.
    """
    node = exchange
    while len(node.children) == 1:
        node = node.children[0]
        base = node.name.split(" ")[0]
        if base in _AGG_OPS:
            return True
        if base not in _ROW_BOUNDED_OPS:
            return False
    return False


def single_partition_consumers(plan: str) -> list[tuple[str, str]]:
    """For each single-partition exchange: ``(consumer_name, verdict)``.

    Verdicts:
    - ``agg-final``   consumer merges partial aggregates (bounded input:
      one row per upstream partition) — fine at any scale.
    - ``limit``       consumer is a limit collect — bounded by the limit.
    - ``window-preagg``  a Sort/Window consumes it AND the exchange
      input is machine-verified to be an aggregate's output reached
      through row-preserving operators only: the funnel carries an
      aggregate-bounded volume (groups × upstream-partitions when the
      first aggregate is a partial), not fact rows. Still needs a
      per-query justification for WHY the group cardinality is bounded.
    - ``window``      a Sort/Window consumes raw (or possibly
      multiplied) rows: the strongest flag — every fact row funnels
      through one task. Must be justified per query, and the CI audit
      pins the exact set of queries allowed to carry it.
    - ``other``       anything else — must be justified per query.
    """
    nodes = parse_formatted_plan(plan)
    out: list[tuple[str, str]] = []
    for n in nodes.values():
        if "Exchange" not in n.name:
            continue
        if "Arguments: SinglePartition" not in n.details:
            continue
        p = n.parent
        pname = p.name if p else "<root>"
        if p is None:
            verdict = "other"
        elif p.name in _AGG_OPS:
            verdict = "agg-final"
        elif "Limit" in p.name:
            verdict = "limit"
        else:
            chain = {p.name}
            if p.parent is not None:
                chain.add(p.parent.name)
                if p.parent.parent is not None:
                    chain.add(p.parent.parent.name)
            if {"Window", "WindowGroupLimit", "Sort"} & chain:
                verdict = (
                    "window-preagg"
                    if _funnel_input_is_preaggregate(n)
                    else "window"
                )
            else:
                verdict = "other"
        out.append((pname, verdict))
    return out


def nested_loop_joins(plan: str) -> list[str]:
    """For each BroadcastNestedLoopJoin: a verdict string.

    - ``scalar-broadcast``: the broadcast subtree contains a global
      (no-keys) aggregate — a 1-row frame folded in; bounded by
      construction.
    - ``limit-bounded``: the broadcast subtree contains a limit
      (TakeOrderedAndProject / GlobalLimit / CollectLimit) — at most
      ``limit`` rows cross the join.
    - ``small-literal``: the broadcast subtree is a LocalTableScan /
      literal range — bounded by the literal's size.
    - ``unbounded``: anything else — a real scale risk.
    """
    nodes = parse_formatted_plan(plan)
    verdicts: list[str] = []
    for n in nodes.values():
        if "BroadcastNestedLoopJoin" not in n.name:
            continue
        verdict = "unbounded"
        # Only the child whose ROOT is the BroadcastExchange is the
        # build side. Scanning any child subtree that merely CONTAINS a
        # BroadcastExchange would let a bounded frame on the STREAMED
        # side (e.g. an upstream folded-in scalar) clear a join whose
        # actual broadcast side is unbounded.
        build_sides = [c for c in n.children if "BroadcastExchange" in c.name]
        for child in build_sides:
            sub = list(_subtree(child))
            if any(
                ("HashAggregate" in s.name or "SortAggregate" in s.name)
                and re.search(r"Keys: \[\]", s.details)
                for s in sub
            ):
                verdict = "scalar-broadcast"
                break
            if any(
                "TakeOrderedAndProject" in s.name
                or "GlobalLimit" in s.name
                or "CollectLimit" in s.name
                for s in sub
            ):
                verdict = "limit-bounded"
                break
            if any(
                "LocalTableScan" in s.name or "Range" == s.name for s in sub
            ):
                verdict = "small-literal"
                break
        verdicts.append(verdict)
    return verdicts
