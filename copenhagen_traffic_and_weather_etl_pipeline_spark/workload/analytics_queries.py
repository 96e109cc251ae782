"""Advanced analytics queries: robust anomaly detection, exponentially
weighted time series, an iterative graph algorithm (PageRank), weighted
sampling without replacement, and quality-aware canonical selection for
dedup clusters.

Same cross-engine determinism contract as the sibling modules: round
every float BEFORE it feeds a comparison/ordering, identical integer
tiebreaks on both engines, md5-derived uniforms for reproducible
randomness (never rand()).

Scale notes are inline per query; the common thread is that every
iteration / window / join is keyed (user_id, event_type, cluster_id) so
work distributes — nothing funnels through a single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import load, register
from .extension_queries import _duck_minhash_ctes, dedup_minhash_lsh

# ---------------------------------------------------------------------------
# Robust anomaly detection: median / MAD per event_type. Two grouped exact
# medians + two broadcast joins — the per-group stats are tiny (one row per
# event_type) so at 100 TB the fact table is scanned twice but never
# shuffled on a non-key: both medians group on event_type and the stat
# joins broadcast.
# ---------------------------------------------------------------------------


@register(
    "anomaly_mad_events",
    oracle="""
WITH med AS (
  SELECT event_type, round(median(value), 6) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, e.value,
         round(abs(e.value - m.med), 6) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, round(median(adev), 6) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.value,
       round(d.adev / (1.4826 * m.mad), 6) AS mad_z
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0 AND round(d.adev / (1.4826 * m.mad), 6) > 3.5
""",
    doc="robust outlier detection: per-event_type median + MAD (median "
    "absolute deviation), flag |x-med|/(1.4826*MAD) > 3.5. Exact medians "
    "via percentile; stats are one row per group so the joins broadcast; "
    "deviations rounded before the threshold on both engines",
    tags=["stats", "anomaly"],
)
def anomaly_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(F.abs(F.col("value") - F.col("med")), 6).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    z = F.round(F.col("adev") / (1.4826 * F.col("mad")), 6)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (z > 3.5))
        .select("event_id", "event_type", "value", z.alias("mad_z"))
    )


# ---------------------------------------------------------------------------
# Exponentially weighted moving average over a bounded trailing frame.
# A true EWMA is a recurrence (not expressible as a window aggregate); the
# standard distributed reformulation is a trailing-K frame with explicit
# weights w^j, normalized by the finite geometric sum so the estimate is
# well-defined from the first row. The frame is collected per row
# (K=16 values) and reduced with JVM-side higher-order functions — no
# Python, no shuffle beyond the one keyed window exchange.
# ---------------------------------------------------------------------------

_EWMA_DECAY = 0.7  # weight on the previous step; newest row has weight 1
_EWMA_K = 16  # trailing frame length (rows)


@register(
    "ewma_user_value",
    oracle=f"""
WITH r AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
  WHERE value IS NOT NULL
),
j AS (
  SELECT a.event_id, a.user_id,
         sum(b.value * pow({_EWMA_DECAY}, a.rn - b.rn)) AS ws,
         count(*) AS m
  FROM r a JOIN r b
    ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - {_EWMA_K - 1} AND a.rn
  GROUP BY a.event_id, a.user_id
)
SELECT event_id, user_id,
       round(ws / ((1 - pow({_EWMA_DECAY}, m)) / {1 - _EWMA_DECAY}), 6) AS ewma
FROM j
""",
    doc=f"per-user EWMA of value (decay {_EWMA_DECAY}, trailing {_EWMA_K} "
    "rows, normalized by the finite geometric sum): collect_list over a "
    "keyed ROWS frame + zip_with/aggregate — pure JVM higher-order "
    "functions, one keyed shuffle. The oracle states the same weighted "
    "mean as a rank-range self-join",
    tags=["window", "timeseries"],
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL values are excluded up front (mirrored in the oracle's WHERE):
    # collect_list silently drops NULLs, which would shift the weight
    # positions vs the oracle's count(*)-based self-join if any appeared.
    # Ordering note: collect_list over a ROWS frame preserves frame order
    # in practice, but that is implementation behavior, not a documented
    # Spark contract — the rn-keyed oracle is the semantic definition.
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_K - 1), 0)
    )
    arr = F.collect_list("value").over(w)  # frame order: oldest -> newest
    m = F.size(arr)
    # exponent m-1 for the oldest element, 0 for the current row
    weighted = F.zip_with(
        arr,
        F.sequence(m - 1, F.lit(0), F.lit(-1)),
        lambda x, j: x * F.pow(F.lit(_EWMA_DECAY), j.cast("double")),
    )
    ws = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    norm = (1 - F.pow(F.lit(_EWMA_DECAY), m.cast("double"))) / (1 - _EWMA_DECAY)
    return e.select(
        "event_id", "user_id", F.round(ws / norm, 6).alias("ewma")
    )


# ---------------------------------------------------------------------------
# PageRank over the event-type transition graph: 3 unrolled power
# iterations. Each iteration is one equi-join (edges x ranks) + one grouped
# sum — the canonical "iterative algorithm as repeated join+agg" shape;
# at scale each round is one shuffle keyed on the destination node and the
# rank vector stays tiny relative to the edge list. Ranks are rounded to
# 10 decimals after every iteration so both engines stay bit-aligned.
# ---------------------------------------------------------------------------

_PR_DAMP = 0.85
_PR_ITERS = 3


def _duck_pagerank_sql() -> str:
    ctes = [
        """r AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
  FROM events
)""",
        """edges AS (
  SELECT prev AS u, event_type AS v, CAST(count(*) AS DOUBLE) AS w
  FROM r WHERE prev IS NOT NULL GROUP BY prev, event_type
)""",
        "outw AS (SELECT u, sum(w) AS ow FROM edges GROUP BY u)",
        "p AS (SELECT e.u, e.v, round(e.w / o.ow, 10) AS p FROM edges e JOIN outw o USING (u))",
        "nodes AS (SELECT DISTINCT event_type AS node FROM events)",
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "pr0 AS (SELECT node, round(1.0 / n.n, 10) AS pr FROM nodes CROSS JOIN n)",
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT nodes.node,
         round({1 - _PR_DAMP} / n.n + {_PR_DAMP} * coalesce(c.s, 0), 10) AS pr
  FROM nodes CROSS JOIN n
  LEFT JOIN (
    SELECT p.v AS node, sum(prev.pr * p.p) AS s
    FROM p JOIN pr{i - 1} prev ON prev.node = p.u
    GROUP BY p.v
  ) c ON c.node = nodes.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node AS event_type, round(pr, 6) AS pagerank FROM pr{_PR_ITERS}"
    )


@register(
    "pagerank_event_transitions",
    oracle=_duck_pagerank_sql(),
    doc=f"PageRank (damping {_PR_DAMP}, {_PR_ITERS} unrolled iterations) "
    "over the event_type->event_type transition graph derived from each "
    "user's consecutive events. Iterative join+agg: one dst-keyed "
    "shuffle per round; ranks rounded to 10 decimals each iteration so "
    "Spark and the unrolled-CTE oracle stay aligned. Simplification "
    "(both engines, intentional): dangling-node mass is NOT "
    "redistributed — nodes with no out-edges contribute nothing, so "
    "ranks do not sum to 1 as in textbook PageRank",
    tags=["graph", "iterative"],
)
def pagerank_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = e.select(
        "event_type", F.lag("event_type").over(seq).alias("prev")
    ).filter(F.col("prev").isNotNull())
    edges = trans.groupBy(
        F.col("prev").alias("u"), F.col("event_type").alias("v")
    ).agg(F.count("*").cast("double").alias("w"))
    outw = edges.groupBy("u").agg(F.sum("w").alias("ow"))
    p = edges.join(outw, "u").select(
        "u", "v", F.round(F.col("w") / F.col("ow"), 10).alias("p")
    )
    nodes = e.select(F.col("event_type").alias("node")).distinct()
    # Node count folded in as a broadcast 1-row aggregate (the oracle's
    # `n` CTE) so building the plan stays lazy — no job runs until the
    # result is collected.
    n = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    base = nodes.crossJoin(F.broadcast(n))  # (node, n_nodes)
    pr = base.select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), 10).alias("pr")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            p.join(pr, p["u"] == pr["node"])
            .groupBy("v")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("s"))
        )
        pr = base.join(contrib, base["node"] == contrib["v"], "left").select(
            "node",
            F.round(
                (1 - _PR_DAMP) / F.col("n_nodes")
                + _PR_DAMP * F.coalesce(F.col("s"), F.lit(0.0)),
                10,
            ).alias("pr"),
        )
    return pr.select(F.col("node").alias("event_type"), F.round("pr", 6).alias("pagerank"))


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-ES): each
# row draws a deterministic uniform u from md5(doc_id) and is ranked by
# u^(1/weight); the top-k by that key is an exact weighted sample. One
# narrow projection + TakeOrderedAndProject — no shuffle beyond the top-k
# merge, reproducible across engines/runs/partitionings.
# ---------------------------------------------------------------------------

_WSAMPLE_K = 100


@register(
    "sample_weighted_docs",
    oracle=f"""
WITH k AS (
  SELECT doc_id, n_chars,
         round(pow(
           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
             / 4294967297.0,
           1.0 / greatest(n_chars, 1)
         ), 9) AS samp_key
  FROM documents
)
SELECT doc_id, n_chars, samp_key
FROM k ORDER BY samp_key DESC, doc_id LIMIT {_WSAMPLE_K}
""",
    doc="weighted sampling without replacement (Efraimidis-Spirakis): "
    "deterministic uniform from md5(doc_id), key = u^(1/n_chars), top-k "
    "by key. Plans as TakeOrderedAndProject (per-partition top-k, driver "
    "merge); key rounded to 9 with doc_id tiebreak so both engines pick "
    "the identical sample",
    tags=["sampling", "training"],
)
def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        + 1
    ) / 4294967297.0
    key = F.round(
        F.pow(u, 1.0 / F.greatest(F.col("n_chars"), F.lit(1))), 9
    ).alias("samp_key")
    return (
        d.select("doc_id", "n_chars", key)
        .orderBy(F.desc("samp_key"), "doc_id")
        .limit(_WSAMPLE_K)
    )


# ---------------------------------------------------------------------------
# Canonical selection for dedup clusters: instead of keep-lowest-doc_id
# (dedup_resolve_clusters), pick the best document per near-dup cluster by
# a quality key (longest text, doc_id tiebreak) — what a real corpus
# pipeline ships. Cluster assignment reuses the MinHash-LSH pairs +
# min-label connected components; the per-cluster argmax is one keyed
# window (clusters are tiny by LSH design, so no skew).
# ---------------------------------------------------------------------------


@register(
    "dedup_canonical_pick",
    oracle=f"""
WITH RECURSIVE {_duck_minhash_ctes()},
edges AS (
  SELECT d1 AS src, d2 AS dst FROM cand
  UNION
  SELECT d2 AS src, d1 AS dst FROM cand
),
reach(node, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
),
cl AS (SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node),
j AS (
  SELECT cl.doc_id, cl.cluster_id, d.n_chars
  FROM cl JOIN documents d USING (doc_id)
)
SELECT doc_id, cluster_id,
       (row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_chars DESC, doc_id) = 1) AS is_canonical
FROM j
""",
    doc="dedup canonical pick: MinHash-LSH pairs -> connected components "
    "-> keep the highest-quality doc per cluster (longest text, doc_id "
    "tiebreak) instead of the arbitrary minimum id. One keyed window "
    "over cluster_id; completes the dedup story pairs -> clusters -> "
    "quality-aware keep/drop",
    tags=["dedup", "clusters"],
)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import resolve_clusters

    docs = load(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir)
    clusters = resolve_clusters(pairs, docs.select("doc_id"))
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "doc_id")
    return (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("is_canonical", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "is_canonical")
    )
