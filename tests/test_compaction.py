"""Add-delta compaction (VERDICT r1 #8): per-wave seen/hash/host reads
must not grow with wave count, and compaction must never change crawl
results — including across crash/resume."""

import os

import pytest

from ieps_crawler_spark.corpus import generate_corpus
from ieps_crawler_spark.plans.crawl import ADD_TABLES, Crawler
from ieps_crawler_spark.sinks.tables import DeltaLog


@pytest.fixture(scope="module")
def setup(spark):
    corpus = generate_corpus(120, seed=42)
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()}
    return corpus, pages, sites, bodies


def _delta_dirs(ckpt, name):
    base = os.path.join(ckpt, "deltas", name)
    return sorted(d for d in os.listdir(base) if not d.endswith(".staging"))


def test_compacted_crawl_identical_and_flat(spark, setup, tmp_path):
    corpus, pages, sites, bodies = setup
    plain = Crawler(spark, pages, sites, bodies, str(tmp_path / "plain"),
                    wave_seconds=60, compact_every=0)
    plain.run(seeds=corpus["seeds"], max_waves=6)
    comp = Crawler(spark, pages, sites, bodies, str(tmp_path / "comp"),
                   wave_seconds=60, compact_every=2)
    comp.run(seeds=corpus["seeds"], max_waves=6)

    cols = ["url", "page_type", "http_status", "content_hash", "wave", "fetch_order"]
    assert (
        plain.results().select(cols).sort("url").collect()
        == comp.results().select(cols).sort("url").collect()
    )
    assert (
        {r["canon_url"] for r in plain.seen().collect()}
        == {r["canon_url"] for r in comp.seen().collect()}
    )
    plain_dirs = _delta_dirs(str(tmp_path / "plain"), "seen_add")
    comp_dirs = _delta_dirs(str(tmp_path / "comp"), "seen_add")
    assert len(plain_dirs) == 7  # waves 0..6
    # 6 waves at compact_every=2: folded repeatedly, O(1) directories
    assert len(comp_dirs) <= 3
    assert any(d.startswith("compact=") for d in comp_dirs)


def test_resume_after_compaction(spark, setup, tmp_path):
    corpus, pages, sites, bodies = setup
    full = Crawler(spark, pages, sites, bodies, str(tmp_path / "full"),
                   wave_seconds=60, compact_every=0)
    full.run(seeds=corpus["seeds"], max_waves=6)

    part = Crawler(spark, pages, sites, bodies, str(tmp_path / "part"),
                   wave_seconds=60, compact_every=2)
    part.run(seeds=corpus["seeds"], max_waves=3)  # compaction ran at wave 2
    resumed = Crawler(spark, pages, sites, bodies, str(tmp_path / "part"),
                      wave_seconds=60, compact_every=2)
    resumed.run(resume=True, max_waves=6)

    cols = ["url", "page_type", "http_status", "content_hash", "wave", "fetch_order"]
    assert (
        full.results().select(cols).sort("url").collect()
        == resumed.results().select(cols).sort("url").collect()
    )


def test_finish_compactions_cleans_crash_leftovers(spark, tmp_path):
    """Simulated crash between the compact-dir rename and source deletion:
    sources coexist with the compact dir; finish_compactions must drop
    them so reads see each row exactly once."""
    log = DeltaLog(str(tmp_path / "deltas"))
    for w in range(4):
        log.append(w, "seen_add",
                   spark.range(w * 10, w * 10 + 10)
                   .selectExpr("cast(id as string) as canon_url"))
    assert log.compact(spark, "seen_add", upto_wave=3, min_dirs=2)
    # resurrect a "deleted" source dir to fake the crash window
    log.append(1, "seen_add",
               spark.range(10, 20).selectExpr("cast(id as string) as canon_url"))
    dup = log.read_all(spark, "seen_add").count()
    assert dup == 50  # duplicates visible pre-cleanup
    log.finish_compactions(ADD_TABLES)
    assert log.read_all(spark, "seen_add").count() == 40
    got = {r["canon_url"] for r in log.read_all(spark, "seen_add").collect()}
    assert got == {str(i) for i in range(40)}
