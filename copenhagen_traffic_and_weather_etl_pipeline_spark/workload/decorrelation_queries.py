"""Correlated-aggregate decorrelation shapes (TPC-H Q17/Q20 style).

The reference's one scalar subquery (``bigquery_scheduled_query.sql:8-15``,
an UNcorrelated MAX) is covered by ``scalar_subquery_latest``. These two
entries teach the harder relational lesson the registry lacked: a
subquery whose aggregate is CORRELATED to the outer row (per-part avg,
per-part total). Executed naively that is one aggregate per outer row —
a nested loop that cannot survive any scale. The Spark side writes the
decorrelated form explicitly: aggregate ONCE per key (partial agg,
map-side combine), then a single equi-join against the outer side. The
DuckDB oracle keeps the correlated-subquery spelling, proving the
rewrite is semantics-preserving.

Float determinism: every threshold feeding a comparison derives from
``sum``/``avg`` of ``l_quantity``, which is integer-valued (1..50) — the
double sum is exact at any permutation, so Spark and DuckDB compute
bit-identical thresholds and the comparisons cannot disagree. Only the
final reported revenue sums floats; it is rounded to 2 decimals like
every other revenue aggregate in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import load, register


@register(
    "small_qty_revenue_q17",
    oracle="""
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4' AND p.p_size < 15
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
""",
    doc="TPC-H Q17 shape: revenue from small-quantity lineitems of one "
    "brand, threshold = correlated per-part 0.2*avg(quantity). "
    "Decorrelated: the part filter prunes first (broadcast dim), the "
    "per-part avg is computed ONCE over the pruned fact slice "
    "(partial agg), and the threshold comes back via one equi-join — "
    "never an aggregate per outer row",
    tags=["subquery", "decorrelation", "join", "agg"],
)
def small_qty_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    parts = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#4") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    # Prune lineitem to the filtered parts BEFORE the aggregate: the
    # correlated avg only matters for parts that survive the brand/size
    # filter, and per-part avg over the pruned slice is identical (the
    # filter is on the correlation key only). No broadcast hint: parts
    # scales with the data; Catalyst/AQE picks broadcast from stats.
    li_parts = li.join(parts, li.l_partkey == parts.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = li_parts.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li_parts.join(thresholds, li_parts.l_partkey == thresholds.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "top_supplier_share_q20",
    oracle="""
SELECT g.l_partkey AS partkey, s.s_suppkey, s.s_name,
       g.supp_qty, g.total_qty
FROM (
  SELECT l.l_partkey, l.l_suppkey, sum(l.l_quantity) AS supp_qty,
         (SELECT sum(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
            AND l2.l_shipdate >= TIMESTAMP '1995-01-01'
            AND l2.l_shipdate < TIMESTAMP '1996-01-01') AS total_qty
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
    AND l.l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY l.l_partkey, l.l_suppkey
  HAVING sum(l.l_quantity) > 0.5 * (
    SELECT sum(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
      AND l2.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l2.l_shipdate < TIMESTAMP '1996-01-01')
) g JOIN supplier s ON s.s_suppkey = g.l_suppkey
""",
    doc="TPC-H Q20 shape: the majority supplier of each part's 1995 "
    "volume (>50% share), threshold = correlated per-part total in the "
    "HAVING. Decorrelated WITHOUT re-aggregating: the fact table is "
    "scanned and shuffled once into per-(part,supplier) sums, and the "
    "per-part total is a window sum OVER the group key on that already-"
    "aggregated |parts x suppliers|-sized frame (a self-join against a "
    "second aggregate would rescan the fact: the differing pushed "
    "filters on the two branches defeat exchange reuse — measured). "
    "Supplier names come via one dimension equi-join on the survivors",
    tags=["subquery", "decorrelation", "window", "agg"],
)
def top_supplier_share_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range predicate, not year(): a raw comparison on the timestamp
    # column pushes down to parquet row-group min/max stats (and prunes
    # date partitions at scale); year(cast(...)) reaches only the
    # post-scan Filter. Literals cast to the column's own timestamp
    # flavor (NTZ vs instant varies by parquet vintage) so the
    # comparison needs no column-side cast — a cast on the column would
    # block the pushdown too.
    li = load(spark, sf_dir, "lineitem")
    ship_type = dict(li.dtypes)["l_shipdate"]
    li95 = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast(ship_type))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast(ship_type))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    per = li95.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    # Per-part totals as a window over the aggregated frame: the window
    # shuffle moves |parts x suppliers| rows, never the fact table, and
    # is partitioned by l_partkey — no global sort, no driver funnel.
    majority = (
        per.withColumn(
            "total_qty", F.sum("supp_qty").over(W.partitionBy("l_partkey"))
        )
        .filter(F.col("supp_qty") > F.lit(0.5) * F.col("total_qty"))
        .select(
            F.col("l_partkey").alias("partkey"),
            "l_suppkey",
            "supp_qty",
            "total_qty",
        )
    )
    sup = load(spark, sf_dir, "supplier")
    return majority.join(sup, majority.l_suppkey == sup.s_suppkey).select(
        "partkey", "s_suppkey", "s_name", "supp_qty", "total_qty"
    )
