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


def _session_fn(key, pdfs, state: GroupState):
    (user_id,) = key
    start, end, n, total = (
        state.get if state.exists else (None, None, 0, 0.0)
    )
    for pdf in pdfs:
        ts = pd.to_datetime(pdf["ts"]).astype("int64") // 1000  # µs
        lo, hi = int(ts.min()), int(ts.max())
        start = lo if start is None else min(start, lo)
        end = hi if end is None else max(end, hi)
        n += len(pdf)
        total += float(pdf["value"].sum())
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(end, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )
    else:
        state.update((start, end, n, total))
        state.setTimeoutDuration(30_000)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
                "total_value": pd.Series([], dtype="float64"),
            }
        )


def sessionize_events(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator surface: per-user running session state
    via applyInPandasWithState (processing-time timeout)."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
