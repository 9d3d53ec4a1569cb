"""Executable live-fetch path WITHOUT external network (VERDICT r3
next-round #5): UrllibFetchFn drives real sockets against an
in-process http.server serving the fixture corpus on localhost, and
the resulting crawl must be byte-identical to the corpus-join default
— converting http_fetcher's production path from a documented stub
into a tested real-socket client (timeouts, non-200 mapping, size cap
per ref:utils/HeadlessBrowser.scala:47-105 semantics).
"""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.corpus import generate_corpus
from ieps_crawler_spark.plans.crawl import Crawler
from ieps_crawler_spark.sources.fetcher import (
    LocalhostRewrite,
    UrllibFetchFn,
    http_fetcher,
)

N_PAGES = 120
MAX_WAVES = 5


class _CorpusHandler(BaseHTTPRequestHandler):
    """Serves the fixture corpus: path = percent-encoded original url.
    Special prefixes exercise the failure mapping:
      slow://   — sleeps past the client timeout
      err500:// — responds 500
      big://    — body larger than the client's max_bytes
    """

    bodies: dict = {}
    hits: list = []

    def do_GET(self):  # noqa: N802 (stdlib naming)
        url = unquote(self.path.lstrip("/"))
        self.hits.append((time.monotonic(), url))
        if url.startswith("slow://"):
            time.sleep(2.0)
            self._send(200, b"too late")
            return
        if url.startswith("err500://"):
            self._send(500, b"boom")
            return
        if url.startswith("big://"):
            self._send(200, b"x" * 4096)
            return
        body = self.bodies.get(url)
        if body is None:
            self._send(404, b"not found")
        else:
            self._send(200, body)

    def _send(self, status, body):
        try:
            self.send_response(status)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        except (BrokenPipeError, ConnectionResetError):
            pass  # client timed out and hung up — expected for slow://

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_PAGES, seed=11)


@pytest.fixture(scope="module")
def server(corpus):
    handler = _CorpusHandler
    handler.bodies = {
        r["url"]: bytes(r["html"])
        for _, r in corpus["pages"].iterrows()
        if r["html"] is not None
    }
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _run(spark, corpus, ckpt, fetcher=None):
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {
        r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()
    }
    cr = Crawler(
        spark, pages, sites, bodies, ckpt, wave_seconds=60, fetcher=fetcher
    )
    cr.run(seeds=corpus["seeds"], max_waves=MAX_WAVES)
    return cr


def _snapshot(cr):
    res = sorted(
        tuple(r) for r in cr.results()
        .select("url", "host", "page_type", "wave", "fetch_order",
                "content_hash", "text")
        .collect()
    )
    seen = sorted(r["canon_url"] for r in cr.seen().collect())
    links = sorted((r["from_url"], r["to_url"]) for r in cr.links().collect())
    return res, seen, links


def test_localhost_sockets_crawl_byte_identical(spark, corpus, server, tmp_path):
    """The whole e2e: politeness batches -> host-partitioned Arrow
    stage -> real GETs over loopback sockets -> identical crawl."""
    port = server.server_address[1]
    fetch_fn = UrllibFetchFn(timeout=5.0, rewrite=LocalhostRewrite(port))
    base = _run(spark, corpus, str(tmp_path / "base"))
    live = _run(
        spark, corpus, str(tmp_path / "live"),
        fetcher=http_fetcher(fetch_fn),
    )
    assert _snapshot(base) == _snapshot(live)
    # the server actually served the crawl (not a silent corpus fall-back)
    assert len(_CorpusHandler.hits) > 0


def test_status_and_error_mapping(server):
    """(status, body) contract (VERDICT r4 #4): real statuses are
    preserved — 500 stays 500, oversize -> 413, timeout/miss -> 404,
    200 -> exact bytes — the HeadlessBrowser-equivalent status map
    (ref:utils/HeadlessBrowser.scala:68-103)."""
    port = server.server_address[1]
    fn = UrllibFetchFn(
        timeout=0.5, max_bytes=1024, rewrite=LocalhostRewrite(port)
    )
    some_url = next(iter(_CorpusHandler.bodies))
    assert fn(some_url) == (200, _CorpusHandler.bodies[some_url])
    assert fn("http://nosuch.gov.si/missing") == (404, None)
    assert fn("err500://x") == (500, None)
    assert fn("big://x") == (413, None)                    # oversize
    t0 = time.monotonic()
    assert fn("slow://x") == (404, None)                   # timeout
    assert time.monotonic() - t0 < 1.9                     # gave up early


def test_connection_refused_maps_to_404():
    fn = UrllibFetchFn(timeout=0.5, rewrite=LocalhostRewrite(1))  # closed port
    assert fn("http://whatever.gov.si/") == (404, None)


def test_live_500_lands_as_invalid_with_real_status(
    spark, corpus, server, tmp_path
):
    """VERDICT r4 #4 done-criterion: a 500-serving URL classifies as
    INVALID carrying http_status 500 (not the corpus-miss 404)."""
    port = server.server_address[1]

    # local class => cloudpickle serializes it by VALUE (a test-module-
    # level class pickles by reference, which executors can't import)
    class _Err500Rewrite(LocalhostRewrite):
        """Diverts one victim url to the server's err500:// handler —
        a host whose page 500s live while present in the corpus."""

        def __init__(self, port, victim):
            super().__init__(port)
            self.victim = victim

        def __call__(self, url):
            if url == self.victim:
                url = "err500://victim"
            return super().__call__(url)

    base = _run(spark, corpus, str(tmp_path / "b500"))
    victim = (
        base.results()
        .filter("page_type = 'HTML' and wave = 1")
        .select("url")
        .first()["url"]
    )
    live = _run(
        spark, corpus, str(tmp_path / "l500"),
        fetcher=http_fetcher(
            UrllibFetchFn(timeout=5.0, rewrite=_Err500Rewrite(port, victim))
        ),
    )
    row = live.results().filter(F.col("url") == victim).first()
    assert row["page_type"] == "INVALID"
    assert row["http_status"] == 500


def test_honor_delays_spaces_same_host_fetches(spark, server):
    """honor_delays=True: consecutive same-host fetches arrive at the
    server no closer than (roughly) the sched_ts spacing."""
    import datetime as dt

    port = server.server_address[1]
    t0 = dt.datetime(2021, 1, 1)
    # one host, 4 urls spaced 300ms on the simulated clock; a second
    # host interleaved to prove spacing is per-host
    rows = []
    for i in range(4):
        rows.append((f"http://nosuch.gov.si/a{i}", "a.gov.si", i + 1,
                     t0 + dt.timedelta(milliseconds=300 * i)))
        rows.append((f"http://nosuch.gov.si/b{i}", "b.gov.si", i + 1,
                     t0 + dt.timedelta(milliseconds=300 * i)))
    batch = spark.createDataFrame(
        rows, "canon_url string, host string, fetch_order long, "
        "sched_ts timestamp",
    )
    _CorpusHandler.hits.clear()
    fn = UrllibFetchFn(timeout=5.0, rewrite=LocalhostRewrite(port))
    http_fetcher(fn, honor_delays=True)(batch).count()
    by_host = {}
    for ts, url in _CorpusHandler.hits:
        host = "a" if "/a" in url else "b"
        by_host.setdefault(host, []).append(ts)
    for host, tss in by_host.items():
        tss.sort()
        assert len(tss) == 4
        gaps = [b - a for a, b in zip(tss, tss[1:])]
        assert all(g >= 0.25 for g in gaps), (host, gaps)
