"""Pluggable fetch stage (SURVEY O4/O8 production mapping).

The reference fetches live over HTTP with a headless browser
(utils/HeadlessBrowser.scala:47-105) under per-domain politeness
workers; this sandbox crawls a stored corpus. Both are the same stage
contract — a ``fetcher`` takes the wave's politeness batch (slim rows:
canon_url, host, fetch_order, sched_ts, delay_ms, ...) and returns it
with an ``html: binary`` column appended (null = miss/404) — so the
engine runs unchanged whether pages come from an Iceberg corpus join or
a live HTTP stage: ``Crawler(fetcher=...)``.

Two implementations:

- ``corpus_fetcher(pages)`` — the default (what ``run_wave`` inlines
  when no fetcher is given): join the batch against the corpus table.
- ``http_fetcher(fetch_fn)`` — the production shape: an Arrow
  ``mapInPandas`` stage over the batch, repartitioned by host so one
  task owns a host's whole batch (the politeness isolation the
  reference gets from one-worker-per-domain) and fetches in sched_ts
  order. The actual wire call is the injectable ``fetch_fn(url) ->
  bytes | None``; there is NO network in this sandbox, so the default
  raises NotImplementedError — tests inject a deterministic in-process
  function, and a real deployment injects requests/playwright. The
  Spark-side plumbing (schema, host partitioning, batch iteration,
  ordering) is real and tested either way (tests/test_fetcher.py:
  fetcher-injected crawl == corpus-join crawl, byte-identical).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType


def corpus_fetcher(pages: DataFrame, broadcast_batch: bool = False):
    """Fetch = batch ⋈ corpus (the engine default). ``pages`` must carry
    (url, html). broadcast_batch=True streams an unbucketed corpus
    against a broadcast of the batch (see plans.wave for when each wins);
    False relies on a url-bucketed corpus layout so only the batch side
    shuffles."""

    def fetch(batch: DataFrame) -> DataFrame:
        corpus = pages.select(F.col("url").alias("canon_url"), "html")
        if broadcast_batch:
            batch.cache()
            hits = corpus.join(F.broadcast(batch), "canon_url", "inner")
            hits.cache()
            miss = batch.join(
                F.broadcast(hits.select("canon_url")), "canon_url", "left_anti"
            )
            return hits.unionByName(
                miss.withColumn("html", F.lit(None).cast("binary"))
            )
        return batch.join(corpus, "canon_url", "left")

    return fetch


def _default_fetch_fn(url: str) -> Optional[bytes]:
    raise NotImplementedError(
        "http_fetcher needs an injected fetch_fn(url) -> bytes | None; "
        "this sandbox has no network. In production inject e.g. "
        "requests.get(url, timeout=...).content behind your rate limiter."
    )


def http_fetcher(
    fetch_fn: Callable[[str], Optional[bytes]] | None = None,
):
    """Production fetch stage: Arrow mapInPandas over the batch.

    Scale posture: ``repartition(host)`` gives each task complete hosts
    (no host spans executors — politeness-safe concurrent fetching; this
    is also why there is deliberately NO salting knob here: splitting
    one host's queue across tasks would break its delay clock). The
    batch is sorted within partitions by (host, sched_ts, fetch_order)
    BEFORE entering Python — Arrow chunks a partition into multiple
    frames (spark.sql.execution.arrow.maxRecordsPerBatch), and chunks
    iterate in partition order, so a plan-level sortWithinPartitions is
    the only way the schedule-order guarantee holds across chunk
    boundaries; a per-chunk pandas sort would not. ``fetch_fn`` is then
    called once per URL in schedule order. The html column is appended
    in-task; nothing host-dim-sized moves. A task honoring sched_ts
    (sleep-until) turns the engine's politeness CLOCK into real rate
    limiting — the corpus twin ignores the clock because stored pages
    need none.

    ``fetch_fn`` must be picklable (it ships to executors). None = the
    documented NotImplementedError stub."""
    fn = fetch_fn or _default_fetch_fn

    def fetch(batch: DataFrame) -> DataFrame:
        # Build a fresh StructType: StructType.add mutates in place and
        # DataFrame.schema is cached, so batch.schema.add(...) would
        # permanently graft a phantom 'html' field onto `batch`.
        out_schema = StructType(
            list(batch.schema.fields) + [StructField("html", BinaryType())]
        )

        def run(batches: Iterator) -> Iterator:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["html"] = [fn(u) for u in pdf["canon_url"]]
                yield pdf

        return (
            batch.repartition("host")
            .sortWithinPartitions("host", "sched_ts", "fetch_order")
            .mapInPandas(run, out_schema)
        )

    return fetch
