"""Structured Streaming surface.

Design decision (SURVEY §2.2): the crawl loop itself is deliberately
batch-iterative — Structured Streaming's non-deterministic micro-batch
boundaries would break exact crawl-order reproduction, which the
north-rule requires. Streaming IS the right tool for the *monitoring*
plane: the crawl's delta log is an append-only directory tree, i.e. a
file-source stream.

``crawl_metrics_stream`` watches the crawl_results delta log and emits
watermarked tumbling-window counts per page_type over sched_ts (the
simulated politeness clock). Late rows (a straggler wave commit) are
handled by the watermark. Tested with ``trigger(availableNow=True)``
so runs are bounded and deterministic in CI.

``sessionize_events`` shows the stateful-op surface over the generic
events table: per-user session aggregation via applyInPandasWithState.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schema import CRAWL_RESULTS


def crawl_metrics_stream(
    spark: SparkSession,
    results_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """readStream over the crawl_results delta log → windowed counts."""
    stream = (
        spark.readStream.schema(CRAWL_RESULTS)
        .option("recursiveFileLookup", "true")
        .parquet(results_dir)
    )
    return (
        stream.withWatermark("sched_ts", watermark)
        .groupBy(F.window("sched_ts", window).alias("w"), "page_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "page_type",
            "n",
        )
    )


def run_metrics_batch(
    spark: SparkSession, results_dir: str, out_dir: str, ckpt_dir: str
) -> None:
    """Bounded run: drain everything currently in the log, then stop."""
    q = (
        crawl_metrics_stream(spark, results_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start long, end long, n long, total double"
GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds


def _emit(user_id, sessions):
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(sessions), dtype="int64"),
            "session_start": pd.Series(
                [pd.Timestamp(s[0], unit="us") for s in sessions],
                dtype="datetime64[us]",
            ),
            "session_end": pd.Series(
                [pd.Timestamp(s[1], unit="us") for s in sessions],
                dtype="datetime64[us]",
            ),
            "n_events": pd.Series([s[2] for s in sessions], dtype="int64"),
            "total_value": pd.Series([s[3] for s in sessions], dtype="float64"),
        }
    )


def _session_fn(key, pdfs, state: GroupState):
    """Event-time 30-min-gap sessionization — the stateful-stream twin of
    the batch lag/running-sum query (q_events_sessionize).

    Each invocation merges the stored open session (an interval with
    counts) and the batch's events by INTERVAL sessionization: sort
    everything by start time, merge adjacent items whose gap ≤ GAP. This
    handles cross-batch out-of-order arrivals on either side of the
    stored session (an event BEFORE the stored start lowers it or forms
    its own earlier session — a naive 'extend the end' fold mislabeled
    both). All merged sessions except the time-wise last emit
    immediately; the last stays open with an event-time timeout at
    end + gap, flushed when the watermark passes it.

    Contract: output equals the batch twin when each user's sessions are
    not SPLIT across micro-batches by late arrivals — an already-emitted
    session cannot be amended in append mode (the standard watermarked
    append-mode limitation; within-watermark stragglers instead surface
    as separate small sessions rather than being dropped)."""
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n, total = state.get
        state.remove()
        yield _emit(user_id, [(start, end, n, total)])
        return

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        yield _emit(user_id, [])
        return
    ev = pd.concat(chunks)
    ts = (pd.to_datetime(ev["ts"]).astype("int64") // 1000).to_numpy()  # µs
    vals = ev["value"].to_numpy(dtype="float64")
    order = ts.argsort(kind="stable")
    items = [[int(t), int(t), 1, float(v)] for t, v in zip(ts[order], vals[order])]
    if state.exists:
        items.append(list(state.get))  # [start, end, n, total]
        items.sort(key=lambda s: (s[0], s[1]))
    merged = []
    for it in items:
        if merged and it[0] - merged[-1][1] <= GAP_US:
            last = merged[-1]
            last[1] = max(last[1], it[1])
            last[2] += it[2]
            last[3] += it[3]
        else:
            merged.append(it)
    cur = merged[-1]
    state.update(tuple(cur))
    state.setTimeoutTimestamp((cur[1] + GAP_US) // 1000)  # ms epoch
    yield _emit(user_id, [tuple(s) for s in merged[:-1]])


def sessionize_events(events_stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Custom stateful operator surface: per-user event-time session
    aggregation via applyInPandasWithState (event-time timeout, so runs
    are deterministic and bounded triggers terminate — a processing-time
    timeout keeps availableNow queries alive waiting for wall clock)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
