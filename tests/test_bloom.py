"""Sharded-Bloom seen-filter tests (VERDICT r1: the 10^10-scale path
existed but was default-off and untested).

Semantics contract: the Bloom only ROUTES candidates. No false negatives
ever (a seen URL must always probe maybe_seen=True); false positives only
cost an exact-join probe. bloom-on must be byte-identical to bloom-off."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.operators.seen import (
    build_bloom, dedup_against_seen, merge_blooms, probe_bloom,
)


@pytest.fixture(scope="module")
def seen(spark):
    df = spark.range(2000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".gov.si/p"), F.col("id").cast("string"),
                 F.lit("/")).alias("canon_url")
    )
    df.cache().count()
    yield df
    df.unpersist()


def _cands(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".gov.si/p"), F.col("id").cast("string"),
                 F.lit("/")).alias("canon_url")
    )


def test_no_false_negatives(spark, seen):
    bloom = build_bloom(seen, n_shards=8)
    bloom.cache()
    flagged = probe_bloom(_cands(spark, 0, 2000), bloom, n_shards=8)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    bloom.unpersist()


def test_false_positive_rate_bounded(spark, seen):
    bloom = build_bloom(seen, n_shards=8, fpp=0.01)
    bloom.cache()
    unseen = _cands(spark, 10_000, 14_000)
    flagged = probe_bloom(unseen, bloom, n_shards=8)
    fp = flagged.filter(F.col("maybe_seen")).count()
    assert fp / 4000 < 0.05, f"false-positive rate {fp / 4000:.3f}"
    bloom.unpersist()


def test_probe_plan_has_no_broadcast_of_blobs(spark, seen):
    """The probe must cogroup (one blob per task), never broadcast the
    bloom table (the r1 plan shipped every shard to every executor)."""
    bloom = build_bloom(seen, n_shards=8)
    flagged = probe_bloom(_cands(spark, 0, 100), bloom, n_shards=8)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan


def test_incremental_merge_equals_full_build(spark, seen):
    """Fixed-size filters are OR-mergeable: build(all) must equal
    merge(build(first half), build(second half)) byte-for-byte — the
    invariant behind O(new)-per-wave incremental maintenance."""
    nb = 1 << 16

    def blobs(df):
        return {
            r["shard"]: (r["n_bits"], r["n_hashes"], bytes(r["bits"]))
            for r in df.collect()
        }

    full = blobs(build_bloom(seen, 8, n_bits=nb))
    inc = blobs(
        merge_blooms(
            build_bloom(_cands(spark, 0, 1000), 8, n_bits=nb),
            build_bloom(_cands(spark, 1000, 2000), 8, n_bits=nb),
        )
    )
    assert full == inc


def test_dedup_bloom_equals_exact(spark, seen):
    bloom = build_bloom(seen, n_shards=8)
    bloom.cache()
    cands = _cands(spark, 1000, 3000)  # half seen, half new
    exact = {r["canon_url"] for r in dedup_against_seen(cands, seen).collect()}
    assert len(exact) == 1000
    # shuffle-verification regime (no hint) and broadcast-verification
    # regime (hint says seen dwarfs suspects) must both be exact
    for hint in (None, 10**9):
        routed = {
            r["canon_url"]
            for r in dedup_against_seen(
                cands, seen, bloom=bloom, n_shards=8, seen_rows_hint=hint
            ).collect()
        }
        assert routed == exact, f"hint={hint}"
    bloom.unpersist()
    spark.catalog.clearCache()


def test_crawl_bloom_on_equals_off(spark, tmp_path):
    """Full-crawl equivalence: the engine with the Bloom pre-filter on
    must produce byte-identical results/seen set to the exact-only path."""
    from ieps_crawler_spark.corpus import generate_corpus
    from ieps_crawler_spark.plans.crawl import Crawler

    corpus = generate_corpus(120, seed=42)
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()}

    off = Crawler(spark, pages, sites, bodies, str(tmp_path / "off"),
                  wave_seconds=60, use_bloom=False)
    off.run(seeds=corpus["seeds"], max_waves=4)
    on = Crawler(spark, pages, sites, bodies, str(tmp_path / "on"),
                 wave_seconds=60, use_bloom=True, bloom_shards=4)
    on.run(seeds=corpus["seeds"], max_waves=4)

    cols = ["url", "page_type", "http_status", "content_hash", "wave", "fetch_order"]
    a = off.results().select(cols).sort("url").collect()
    b = on.results().select(cols).sort("url").collect()
    assert a == b
    sa = {r["canon_url"] for r in off.seen().collect()}
    sb = {r["canon_url"] for r in on.seen().collect()}
    assert sa == sb
