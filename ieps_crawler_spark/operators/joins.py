"""Temporal join operators missing from Spark's built-in set.

Spark has no ASOF JOIN (SPARK-22947): "attach to each probe row the
most recent state row at or before its timestamp" — the event-state
join every webtext/event pipeline needs (latest robots snapshot per
fetch, latest user attribute per click, latest price per trade). The
usual workarounds are a per-key range self-join (output explodes with
the number of candidate state rows before the max is taken) or a
driver-side loop; neither survives 100 TB.

This implements it as the union-window pattern: tag both sides, union
them, shuffle ONCE on the join key, and carry the latest right-side
payload forward with last(ignorenulls) over an ordered running window.
Cost = one shuffle of (left + right) rows and a per-key sort — the
same cost as the groupBy the pipeline would run next anyway, with no
intermediate pair blow-up and no driver involvement. Skewed keys cost
their own row count, never a cross product.

No reference counterpart (the reference keeps per-site state in
PostgreSQL rows it re-reads per page, Site.scala / crawldb.sql); this
is the distributed re-expression of that "current state at fetch time"
lookup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_points"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    matched_ts_col: str | None = "asof_ts",
    tolerance: float | None = None,
) -> DataFrame:
    """Backward as-of left join: every left row gains the payload of
    the latest right row with the same key and ``right_ts <= left_ts``
    (inclusive), or nulls when no such row exists — DuckDB
    ``ASOF LEFT JOIN`` / pandas ``merge_asof`` semantics.

    ``payload`` names the right columns to attach (default: all but
    key + timestamp); ``matched_ts_col`` additionally exposes the
    matched right timestamp (None to omit). ``tolerance`` (seconds)
    nulls the payload when the match is older than ``left_ts -
    tolerance``, like ``merge_asof(tolerance=...)``.

    Deterministic and partition-independent: the window orders by
    (ts, side, payload struct), so when several right rows share one
    (key, ts) the greatest payload struct wins — callers wanting a
    specific winner pre-aggregate the right side to one row per
    (key, ts), which also matches engines whose ASOF leaves ties
    undefined.

    Scale posture: ONE shuffle on the join key (the union feeds a
    single window), no pair materialization — each left row is stored
    once with its running "latest state" regardless of how many right
    rows precede it. The payload rides inside a struct so wide state
    tables don't multiply sort keys.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in set(keys) | {right_ts}]
    collide = (set(payload) | ({matched_ts_col} if matched_ts_col else set())) & set(
        left.columns
    )
    if collide:
        raise ValueError(
            f"payload/matched columns collide with left columns: {sorted(collide)};"
            " rename or project the left side first"
        )

    pl = F.struct(
        F.col(right_ts).alias("__matched_ts"),
        *[F.col(c).alias(c) for c in payload],
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        pl.alias("__pl"),
    )
    pl_type = r2.schema["__pl"].dataType
    lrow = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pl_type).alias("__pl"),
        lrow.alias("__lrow"),
    )
    lrow_type = l2.schema["__lrow"].dataType
    r2 = r2.withColumn("__lrow", F.lit(None).cast(lrow_type))

    # right rows (__side 0) sort before left rows at equal ts -> the
    # match is inclusive; __pl last so equal-(key, ts) right rows have
    # a total order (greatest payload struct wins via last())
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__pl").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hit: Column = F.last("__pl", ignorenulls=True).over(w)
    out = (
        r2.unionByName(l2)
        .withColumn("__hit", hit)
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        fresh = (
            F.col("__ts").cast("double")
            - F.col("__hit.__matched_ts").cast("double")
        ) <= F.lit(float(tolerance))
        out = out.withColumn(
            "__hit", F.when(fresh, F.col("__hit"))  # else null
        )

    cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    if matched_ts_col:
        cols.append(F.col("__hit.__matched_ts").alias(matched_ts_col))
    cols += [F.col(f"__hit.{c}").alias(c) for c in payload]
    return out.select(*cols)


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: str | list[str] | None = None,
    bucket_width: float = 1.0,
) -> DataFrame:
    """Point-in-interval inner join (``lo <= x <= hi``, optional equal
    key) without the nested-loop plan Spark gives non-equi joins: each
    interval explodes into the fixed-width buckets it covers, each
    point lives in exactly ONE bucket, and the match becomes an
    equi-join on (key, bucket) + a residual filter. No duplicate
    elimination is needed — a (point, interval) pair can only meet in
    the point's single bucket.

    ``bucket_width`` trades explode factor against join selectivity:
    pick it near the TYPICAL interval length, so each interval lands in
    ~2 buckets and each bucket's candidate set stays local. Cost is
    O(points + intervals·(len/width)) rows into one shuffle — never the
    per-key cross product a naive BroadcastNestedLoopJoin materializes,
    which is the difference between a 100 TB event table joining
    incident windows in one pass and not finishing.

    Both sides must share no column names (project/rename first);
    numeric or timestamp-cast columns only (the caller converts
    timestamps to epoch seconds — monotone, so the residual compare is
    equivalent).
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"points/intervals share non-key columns {sorted(overlap)}; "
            "rename or project first"
        )
    b = float(bucket_width)
    pt = points.withColumn(
        "_b", F.floor(F.col(point_col).cast("double") / b).cast("long")
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("double") / b).cast("long"),
                F.floor(F.col(hi_col).cast("double") / b).cast("long"),
            )
        ),
    )
    return (
        pt.join(iv, keys + ["_b"])
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_b")
    )
