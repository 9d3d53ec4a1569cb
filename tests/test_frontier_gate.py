"""Discovery-time URL curation gate (``Crawler(frontier_gate=...)``):
the UT1-blocklist composition point. Contracts:

- gate=None and an always-true gate crawl byte-identically (the gate
  costs nothing when it blocks nothing);
- a host-blocking gate removes exactly that host's discovered URLs —
  never fetched, never in the seen set — while every other fetched
  row is byte-identical to the ungated crawl's row for that URL;
- the callable (join-shaped) form agrees with the Column form for the
  same blocklist;
- seeds bypass the gate (trusted operator input).
"""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.corpus import generate_corpus
from ieps_crawler_spark.plans.crawl import Crawler

N_PAGES = 120
MAX_WAVES = 14


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_PAGES, seed=7)


def _crawl(spark, corpus, ckpt, **kw):
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {
        r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()
    }
    c = Crawler(spark, pages, sites, bodies, ckpt, wave_seconds=60, **kw)
    st = c.run(seeds=corpus["seeds"], max_waves=MAX_WAVES)
    assert st.waves < MAX_WAVES, f"crawl still pending at {st.waves} waves"
    return c


def _table(crawler):
    return {
        r["url"]: (r["page_type"], r["wave"], r["fetch_order"])
        for r in crawler.results().collect()
    }


@pytest.fixture(scope="module")
def ungated(spark, corpus, tmp_path_factory):
    return _table(
        _crawl(spark, corpus, str(tmp_path_factory.mktemp("gate_none")))
    )


@pytest.fixture(scope="module")
def blocked_host(corpus):
    # a host that is discovered (not seeded) — block it and the crawl
    # must proceed identically elsewhere. Pick the lexicographically
    # first non-seed host actually present in the corpus pages.
    import re

    seed_hosts = {re.sub(r"^https?://([^/]+).*$", r"\1", s)
                  for s in corpus["seeds"]}
    hosts = sorted(
        {re.sub(r"^https?://([^/]+).*$", r"\1", u)
         for u in corpus["pages"]["url"]}
        - seed_hosts
    )
    assert hosts, "corpus has no non-seed host to block"
    return hosts[0]


def test_true_gate_is_byte_identical(spark, corpus, ungated,
                                     tmp_path_factory):
    gated = _table(_crawl(
        spark, corpus, str(tmp_path_factory.mktemp("gate_true")),
        frontier_gate=F.lit(True),
    ))
    assert gated == ungated


def test_host_block_removes_exactly_that_host(spark, corpus, ungated,
                                              blocked_host,
                                              tmp_path_factory):
    cr = _crawl(
        spark, corpus, str(tmp_path_factory.mktemp("gate_block")),
        frontier_gate=F.col("host") != blocked_host,
    )
    gated = _table(cr)
    # nothing from the blocked host was fetched...
    assert not any(u for u in gated
                   if f"//{blocked_host}/" in u or u.endswith(blocked_host)), (
        [u for u in gated if blocked_host in u]
    )
    # ...nor admitted to the seen set
    seen = [r["canon_url"] for r in
            cr.deltas.read_all(spark, "seen_add").collect()]
    assert not any(blocked_host in u for u in seen)
    # every surviving URL matches the ungated crawl's classification
    for u, (ptype, _, _) in gated.items():
        assert u in ungated
        assert ungated[u][0] == ptype, u
    # and the only missing URLs are the blocked host's
    missing = set(ungated) - set(gated)
    assert missing and all(blocked_host in u for u in missing), (
        sorted(missing)[:5]
    )


def test_callable_gate_matches_column_gate(spark, corpus, blocked_host,
                                           tmp_path_factory):
    col_run = _table(_crawl(
        spark, corpus, str(tmp_path_factory.mktemp("gate_col")),
        frontier_gate=F.col("host") != blocked_host,
    ))

    def join_gate(cand):
        # join-shaped gate: anti-join against a blocklist DataFrame —
        # the functions/urlfilter.classify_urls scale-path pattern
        bl = cand.sparkSession.createDataFrame(
            [(blocked_host,)], "host string"
        )
        return cand.join(F.broadcast(bl), "host", "left_anti")

    call_run = _table(_crawl(
        spark, corpus, str(tmp_path_factory.mktemp("gate_call")),
        frontier_gate=join_gate,
    ))
    assert call_run == col_run


def test_seeds_bypass_gate(spark, corpus, tmp_path_factory):
    # blocking EVERY discovered link still fetches the seeds (and their
    # sitemap-injected first-touch rows)
    cr = _crawl(
        spark, corpus, str(tmp_path_factory.mktemp("gate_all")),
        frontier_gate=F.lit(False),
    )
    got = _table(cr)
    assert got, "seed fetches must survive an all-blocking gate"
