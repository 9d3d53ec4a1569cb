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
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StructField,
    StructType,
)


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
        "http_fetcher needs an injected fetch_fn(url) -> bytes | None "
        "(legacy) or (status:int, body:bytes|None); inject "
        "UrllibFetchFn(...) for a real-socket stdlib client, or "
        "e.g. requests/playwright behind your own rate limiter."
    )


def _normalize_fetch_result(result):
    """Adapter for the widened fetch_fn contract (VERDICT r4 #4).

    New-shape callables return ``(status:int, body:bytes|None)`` so the
    wave dispatch can classify INVALID by the REAL status — matching the
    reference, which stores per-status fetch failures
    (ref:utils/HeadlessBrowser.scala:68-103; the report's 12-13.5%
    INVALID breakdown is by status). Legacy callables returning bare
    ``bytes | None`` still work: a body maps to status 200, a bare miss
    maps to status None (the wave's 404 default — exactly the old
    behavior)."""
    if isinstance(result, tuple) and len(result) == 2:
        status, body = result
        if status is not None and int(status) != 200:
            # non-200 never carries a body downstream — the reference
            # parses only 2xx pages (DomainWorkerActor.scala:180) and
            # the wave dispatch treats html-present as status 200
            body = None
        return (None if status is None else int(status)), body
    return (200 if result is not None else None), result


class LocalhostRewrite:
    """URL rewrite for in-process test servers: the original url is
    percent-encoded into the path of http://127.0.0.1:{port}/ so a
    fixture server can look it up verbatim. Plain-attribute class =
    picklable, so it ships to executor Python workers."""

    def __init__(self, port: int, host: str = "127.0.0.1"):
        self.port = port
        self.host = host

    def __call__(self, url: str) -> str:
        from urllib.parse import quote

        return f"http://{self.host}:{self.port}/{quote(url, safe='')}"


class UrllibFetchFn:
    """Real-socket fetch_fn for http_fetcher — stdlib urllib, no
    third-party deps, picklable (plain attributes only).

    Returns ``(status:int, body:bytes|None)`` — the widened contract —
    with status semantics matching the reference's browser fetch
    (ref:utils/HeadlessBrowser.scala:47-105, which maps
    UnknownHostException to 404 and malformed pages to 400 and stores
    every failure by its real status): a 200 with a body within
    ``max_bytes`` yields ``(200, bytes)``; an HTTP error status yields
    ``(status, None)``; unknown host / connection refused / timeout
    yields ``(404, None)``; a malformed or truncated response
    (http.client.HTTPException, ValueError) yields ``(400, None)``; an
    oversize body yields ``(413, None)`` — a client-side policy
    rejection, surfaced as Payload-Too-Large. Every None body lands on
    the engine's miss path, which page-state dispatch classifies as
    INVALID carrying that status (plans/wave.py §4).
    Redirects are followed by urllib's default opener up to its hop
    limit, matching the browser's implicit redirect-following; the
    crawl-side redirect *analytics* live in operators/redirects.py.

    ``rewrite`` maps the canonical url to the wire target — identity in
    production, LocalhostRewrite in the in-process e2e test
    (tests/test_fetcher_localhost.py drives this class against a real
    http.server over sockets and proves the crawl byte-identical to
    the corpus join)."""

    def __init__(
        self,
        timeout: float = 10.0,
        max_bytes: int = 10_000_000,
        rewrite: Optional[Callable[[str], str]] = None,
        user_agent: str = "ieps-crawler-spark/0.1",
    ):
        self.timeout = timeout
        self.max_bytes = max_bytes
        self.rewrite = rewrite
        self.user_agent = user_agent

    def __call__(self, url: str):
        import http.client
        import urllib.error
        import urllib.request

        target = self.rewrite(url) if self.rewrite is not None else url
        req = urllib.request.Request(
            target, headers={"User-Agent": self.user_agent}
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                status = getattr(r, "status", 200)
                if status != 200:
                    return status, None
                body = r.read(self.max_bytes + 1)
        except urllib.error.HTTPError as e:
            # non-2xx with a real status line — keep the status
            return e.code, None
        except (urllib.error.URLError, OSError):
            # unknown host / refused / timeout -> 404, matching
            # ref:utils/HeadlessBrowser.scala:68-103's UnknownHost map
            return 404, None
        except (http.client.HTTPException, ValueError):
            # malformed response (BadStatusLine, IncompleteRead,
            # LineTooLong) or unparsable target -> 400 per reference;
            # without this clause a truncated server reply would escape
            # and crash the Spark task (ADVICE r4)
            return 400, None
        if len(body) > self.max_bytes:
            return 413, None
        return 200, bytes(body)


def http_fetcher(
    fetch_fn: Callable[[str], Optional[bytes]] | None = None,
    honor_delays: bool = False,
    max_sleep_s: float = 30.0,
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

    ``honor_delays=True`` turns the schedule into real rate limiting:
    between consecutive fetches of the SAME host the task sleeps the
    sched_ts delta (the politeness delay_ms spacing politeness.py
    encoded), capped at ``max_sleep_s``. Deltas, not absolute times —
    sched_ts runs on the engine's simulated WAVE_EPOCH clock, so only
    the spacing is meaningful on a wall clock. Per-host last-seen state
    lives in the task generator and carries across Arrow chunks, which
    iterate in partition order (the sortWithinPartitions above is what
    makes that a schedule-order guarantee).

    ``fetch_fn`` must be picklable (it ships to executors); it may
    return legacy ``bytes | None`` or the widened ``(status, body)``
    shape — _normalize_fetch_result adapts both, and the output frame
    carries BOTH ``html: binary`` and ``fetch_status: int`` (null
    status = legacy miss; the wave dispatch coalesces it to 404).
    None = the documented NotImplementedError stub."""
    fn = fetch_fn or _default_fetch_fn

    def fetch(batch: DataFrame) -> DataFrame:
        # Build a fresh StructType: StructType.add mutates in place and
        # DataFrame.schema is cached, so batch.schema.add(...) would
        # permanently graft a phantom 'html' field onto `batch`.
        out_schema = StructType(
            list(batch.schema.fields)
            + [
                StructField("html", BinaryType()),
                StructField("fetch_status", IntegerType()),
            ]
        )

        def run(batches: Iterator) -> Iterator:
            import time

            import pandas as pd

            last: dict = {}
            for pdf in batches:
                pdf = pdf.copy()
                if not honor_delays:
                    norm = [
                        _normalize_fetch_result(fn(u))
                        for u in pdf["canon_url"]
                    ]
                    pdf["html"] = [b for _, b in norm]
                    pdf["fetch_status"] = pd.array(
                        [s for s, _ in norm], dtype="Int32"
                    )
                    yield pdf
                    continue
                out = []
                for host, sched, url in zip(
                    pdf["host"], pdf["sched_ts"], pdf["canon_url"]
                ):
                    if not pd.isna(sched):
                        prev = last.get(host)
                        if prev is not None:
                            dt = (sched - prev).total_seconds()
                            if dt > 0:
                                time.sleep(min(dt, max_sleep_s))
                        last[host] = sched
                    out.append(_normalize_fetch_result(fn(url)))
                pdf["html"] = [b for _, b in out]
                pdf["fetch_status"] = pd.array(
                    [s for s, _ in out], dtype="Int32"
                )
                yield pdf

        return (
            batch.repartition("host")
            .sortWithinPartitions("host", "sched_ts", "fetch_order")
            .mapInPandas(run, out_schema)
        )

    return fetch
