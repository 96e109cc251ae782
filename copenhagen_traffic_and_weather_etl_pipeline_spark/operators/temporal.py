"""Temporal / non-equi join operators: as-of join and interval (range)
join (north-star extensions — the reference's only join is a 4-key equi
join, bigquery_scheduled_query.sql:2-6; these are the joins its hourly
time-series data model invites but BigQuery-side SQL never wrote).

Both are built from stock DataFrame primitives with explicit scale
strategies:

- **as-of join**: the naive formulation (theta-join on ``l.ts >= r.ts``
  then rank) explodes quadratically inside each key. Instead: union both
  sides, one window per key ordered by time, and carry the last non-null
  right-side payload forward (``last(..., ignorenulls=True)`` over
  unbounded-preceding). One shuffle on the key, linear state, no
  explosion — works at any history length.
- **interval join**: a point-in-interval theta join can't hash. For a
  small interval table, broadcast it and let the range predicate run as
  a broadcast nested-loop. At scale, align both sides to fixed-width
  buckets (interval rows explode into every bucket they cover; points
  hash to one) and equi-join on the bucket with a residual range filter
  — turning the non-equi join into a shuffle-hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Backward as-of LEFT join: each left row gains the right-side
    payload of the latest right row with ``right_ts <= left_ts`` in the
    same key group (ties at equal timestamps match, like SQL
    ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``).

    The right side should be unique per (key, ts) — pre-aggregate it if
    not, or the carried payload at a tied timestamp is nondeterministic.
    Output: all left columns + the right payload columns (null when no
    preceding right row exists).
    """
    payload_cols = [c for c in right.columns if c not in on and c != right_ts]
    left_cols = [c for c in left.columns]

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        # Right rows sort before left rows at an equal timestamp so
        # "preceding or equal" includes ties.
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols if c not in on and c != left_ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in on and c != left_ts
        ],
        *payload_cols,
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Carry the latest right ROW as one struct, not per-column last():
    # the struct is non-null for every right row even when its payload
    # fields are NULL, so (a) a NULL-valued purchase still wins over an
    # older non-null one — real ASOF row semantics, the NULL-boost gate
    # caught per-column ignorenulls resurrecting stale values — and
    # (b) all payload columns come from the SAME right row.
    carried = unioned.select(
        *on,
        "_ts",
        "_side",
        *[c for c in left_cols if c not in on and c != left_ts],
        F.last(
            F.when(F.col("_side") == 0, F.struct(*payload_cols)),
            ignorenulls=True,
        )
        .over(w)
        .alias("_pay"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *on,
        F.col("_ts").alias(left_ts),
        *[c for c in left_cols if c not in on and c != left_ts],
        *[F.col(f"_pay.{c}").alias(c) for c in payload_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float | None = None,
) -> DataFrame:
    """Inner join of points to half-open intervals [lo, hi).

    ``bucket_width=None``: broadcast the (small) interval table; the
    range predicate runs as a broadcast join — right for dimension-sized
    interval sets. With ``bucket_width``: both sides align to fixed
    buckets and the join becomes an equi-join on the bucket id plus a
    residual range filter — the scale path when the interval table is
    itself large. Intervals must not be wider than a few buckets for
    the explode to stay cheap.
    """
    if bucket_width is None:
        cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
        return points.join(F.broadcast(intervals), cond, "inner")

    bw = float(bucket_width)
    p = points.withColumn("_bucket", F.floor(F.col(point_col) / bw).cast("long"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("long"),
                # hi is exclusive: a bucket starting exactly at hi holds
                # no matching points.
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bw
                ).cast("long"),
            )
        ),
    )
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    return p.join(iv, "_bucket").filter(cond).drop("_bucket")


__all__ = ["asof_join", "interval_join"]
