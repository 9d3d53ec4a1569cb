"""Checkpoint/resume equivalence (SURVEY §5.3): kill after wave k, resume
from the snapshot, final state identical to an uninterrupted run —
including truncation of orphan deltas from a simulated torn commit."""

import pyspark.sql.functions as F
import pytest

from ieps_crawler_spark.corpus import generate_corpus
from ieps_crawler_spark.plans.crawl import Crawler


@pytest.fixture(scope="module")
def setup(spark):
    corpus = generate_corpus(120, seed=42)
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()}
    return corpus, pages, sites, bodies


def test_resume_identical(spark, setup, tmp_path):
    corpus, pages, sites, bodies = setup
    full = Crawler(spark, pages, sites, bodies, str(tmp_path / "full"), wave_seconds=60)
    full.run(seeds=corpus["seeds"], max_waves=5)

    part = Crawler(spark, pages, sites, bodies, str(tmp_path / "part"), wave_seconds=60)
    part.run(seeds=corpus["seeds"], max_waves=2)  # "crash" after wave 2
    # torn-commit simulation: orphan delta newer than the last snapshot
    orphan = part.results().limit(3).withColumn("wave", F.lit(99))
    part.deltas.append(99, "crawl_results", orphan)

    resumed = Crawler(spark, pages, sites, bodies, str(tmp_path / "part"), wave_seconds=60)
    resumed.run(resume=True, max_waves=5)

    cols = ["url", "page_type", "http_status", "content_hash", "wave", "fetch_order"]
    a = full.results().select(cols).sort("url").collect()
    b = resumed.results().select(cols).sort("url").collect()
    assert a == b
    assert set(map(tuple, full.links().collect())) == set(
        map(tuple, resumed.links().collect())
    )
    sa = {r["canon_url"] for r in full.seen().collect()}
    sb = {r["canon_url"] for r in resumed.seen().collect()}
    assert sa == sb


def test_fresh_start_clears_stale_deltas(spark, setup, tmp_path):
    """A fresh (resume=False) run over a reused checkpoint dir must not
    inherit the previous crawl's seen/hash deltas — stale seen_add rows
    would silently dedup this run's URLs (ADVICE r1)."""
    corpus, pages, sites, bodies = setup
    ckpt = str(tmp_path / "reused")
    # the stale crawl runs LONGER than the fresh one so its leftover
    # higher-numbered snapshots would be distinguishable contamination
    first = Crawler(spark, pages, sites, bodies, ckpt, wave_seconds=60)
    first.run(seeds=corpus["seeds"], max_waves=5)
    stale_results = first.results().count()
    assert stale_results > 0

    fresh = Crawler(spark, pages, sites, bodies, ckpt, wave_seconds=60)
    fresh.run(seeds=corpus["seeds"], max_waves=3)

    clean = Crawler(
        spark, pages, sites, bodies, str(tmp_path / "clean"), wave_seconds=60
    )
    clean.run(seeds=corpus["seeds"], max_waves=3)
    cols = ["url", "page_type", "http_status", "content_hash", "wave", "fetch_order"]
    a = clean.results().select(cols).sort("url").collect()
    b = fresh.results().select(cols).sort("url").collect()
    assert a == b
    # stale SNAPSHOTS must be gone too: resuming the reused dir must
    # continue the fresh crawl, not the first crawl's higher-numbered
    # frontier (the first run's wave-3 snapshot would otherwise win)
    resumed = Crawler(spark, pages, sites, bodies, ckpt, wave_seconds=60)
    resumed.run(resume=True, max_waves=5)
    clean.run(resume=True, max_waves=5)
    a = clean.results().select(cols).sort("url").collect()
    b = resumed.results().select(cols).sort("url").collect()
    assert a == b


def test_resume_requires_state(spark, setup, tmp_path):
    corpus, pages, sites, bodies = setup
    c = Crawler(spark, pages, sites, bodies, str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        c.run(resume=True)


def test_resume_identical_under_wave_cap(spark, setup, tmp_path):
    """Resume with resource-bounded waves: capped runs return displaced
    rows to pending — the snapshot/pending contract must survive a
    restart byte-identically (same results, links, seen set)."""
    corpus, pages, sites, bodies = setup
    kw = dict(wave_seconds=60, max_urls_per_wave=40)
    full = Crawler(
        spark, pages, sites, bodies, str(tmp_path / "cfull"), **kw
    )
    full.run(seeds=corpus["seeds"], max_waves=9)

    part = Crawler(
        spark, pages, sites, bodies, str(tmp_path / "cpart"), **kw
    )
    part.run(seeds=corpus["seeds"], max_waves=3)
    resumed = Crawler(
        spark, pages, sites, bodies, str(tmp_path / "cpart"), **kw
    )
    resumed.run(resume=True, max_waves=9)

    cols = ["url", "page_type", "http_status", "content_hash", "wave",
            "fetch_order"]
    a = full.results().select(cols).sort("url").collect()
    b = resumed.results().select(cols).sort("url").collect()
    assert a == b
    sa = {r["canon_url"] for r in full.seen().collect()}
    sb = {r["canon_url"] for r in resumed.seen().collect()}
    assert sa == sb
