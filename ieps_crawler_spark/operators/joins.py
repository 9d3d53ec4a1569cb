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

__all__ = ["asof_join"]


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
