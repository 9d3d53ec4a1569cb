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


def test_default_fetch_fn_is_a_documented_stub(spark):
    from ieps_crawler_spark.sources.fetcher import _default_fetch_fn

    with pytest.raises(NotImplementedError):
        _default_fetch_fn("http://example.gov.si/")
