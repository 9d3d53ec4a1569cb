"""Pluggable fetch stage (VERDICT r2 missing #4 / SURVEY O4 production
mapping): Crawler(fetcher=...) swaps the corpus join for any
batch -> batch+html stage. Contract: an http_fetcher-shaped stage fed a
deterministic in-process fetch_fn must reproduce the corpus-join crawl
byte-identically — proving a real HTTP deployment changes ONE injection
point, nothing downstream."""

import pytest

from ieps_crawler_spark.corpus import generate_corpus
from ieps_crawler_spark.plans.crawl import Crawler
from ieps_crawler_spark.sources.fetcher import corpus_fetcher, http_fetcher

N_PAGES = 120
MAX_WAVES = 5


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_PAGES, seed=11)


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


def test_http_shaped_fetcher_byte_identical(spark, corpus, tmp_path):
    base = _run(spark, corpus, str(tmp_path / "base"))

    body = {
        r["url"]: bytes(r["html"]) for _, r in corpus["pages"].iterrows()
    }

    def fake_http(url):  # the injected wire call — deterministic in-process
        return body.get(url)

    injected = _run(
        spark, corpus, str(tmp_path / "http"), fetcher=http_fetcher(fake_http)
    )
    assert _snapshot(base) == _snapshot(injected)


def test_corpus_fetcher_closure_matches_inline_default(spark, corpus, tmp_path):
    pages = spark.createDataFrame(corpus["pages"])
    base = _run(spark, corpus, str(tmp_path / "b2"))
    viacf = _run(
        spark, corpus, str(tmp_path / "cf"),
        fetcher=corpus_fetcher(pages, broadcast_batch=True),
    )
    assert _snapshot(base) == _snapshot(viacf)


def test_normalize_fetch_result_contract():
    """Widened (status, body) contract + legacy adapter: bodies only
    ever flow downstream with status 200 (reference parses 2xx only,
    DomainWorkerActor.scala:180); legacy bytes map to 200/None."""
    from ieps_crawler_spark.sources.fetcher import _normalize_fetch_result as n

    assert n(b"page") == (200, b"page")          # legacy hit
    assert n(None) == (None, None)               # legacy miss
    assert n((200, b"page")) == (200, b"page")
    assert n((500, None)) == (500, None)
    assert n((500, b"error body")) == (500, None)  # body stripped
    assert n((404, None)) == (404, None)
    assert n(b"") == (200, b"")                  # empty body is a hit


def test_default_fetch_fn_is_a_documented_stub(spark):
    from ieps_crawler_spark.sources.fetcher import _default_fetch_fn

    with pytest.raises(NotImplementedError):
        _default_fetch_fn("http://example.gov.si/")


def test_schedule_order_survives_arrow_chunking(spark):
    """A partition larger than one Arrow batch must still fetch each
    host's URLs in (sched_ts, fetch_order) order: the sort has to be a
    plan-level sortWithinPartitions, not a per-chunk pandas sort (chunks
    iterate in partition order, so only a pre-sorted partition keeps the
    guarantee across chunk boundaries)."""
    import datetime as dt
    import itertools

    from pyspark.sql import functions as F

    t0 = dt.datetime(2021, 1, 1)
    rows = [
        (
            f"http://h{i % 3}.gov.si/p{i}/",
            f"h{i % 3}.gov.si",
            i,
            t0 + dt.timedelta(seconds=i),
        )
        # deliberately interleaved host/sched order in the input
        for i in reversed(range(60))
    ]
    batch = spark.createDataFrame(
        rows, "canon_url string, host string, fetch_order long, "
        "sched_ts timestamp",
    )

    counter = itertools.count()

    def stamping_fetch(url):  # encodes per-worker call sequence
        return str(next(counter)).encode()

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = (
            http_fetcher(stamping_fetch)(batch)
            .select(
                "host", "sched_ts", "fetch_order",
                F.decode("html", "UTF-8").cast("long").alias("seq"),
            )
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    assert len(out) == 60 and len(by_host) == 3
    for host, rs in by_host.items():
        rs.sort(key=lambda r: (r.sched_ts, r.fetch_order))
        seqs = [r.seq for r in rs]
        assert seqs == sorted(seqs), (
            f"{host} fetched out of schedule order: {seqs}"
        )

    # the phantom-column regression: building the output schema must not
    # mutate the input DataFrame's cached schema (StructType.add mutates
    # in place), so a second application still works
    assert "html" not in batch.columns
    assert http_fetcher(lambda u: None)(batch).count() == 60
