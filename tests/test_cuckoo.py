"""Sharded cuckoo-filter seen-filter tests (the north rule's second
filter family: "partitioned Bloom/cuckoo URL-seen filter").

Same semantics contract as the Bloom path: the filter only ROUTES
candidates — no false negatives ever (overflow lands in the exact
stash), false positives only cost an exact-join probe, cuckoo-on must
be byte-identical to exact-only dedup. Plus the cuckoo-specific
capability Bloom lacks: deletion."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.operators.cuckoo import (
    build_cuckoo,
    delete_from_cuckoo,
    merge_cuckoos,
    probe_cuckoo,
)
from ieps_crawler_spark.operators.seen import dedup_against_seen


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
    ck = build_cuckoo(seen, n_shards=8, n_buckets=1 << 10)
    ck.cache()
    flagged = probe_cuckoo(_cands(spark, 0, 2000), ck, n_shards=8)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    ck.unpersist()


def test_no_false_negatives_even_overfull(spark, seen):
    """Deliberately tiny table: most inserts overflow into the stash —
    probes must STILL never miss a seen URL (fpp degrades, never
    correctness; mirrors the Bloom overfill contract)."""
    ck = build_cuckoo(seen, n_shards=2, n_buckets=1 << 4)
    ck.cache()
    flagged = probe_cuckoo(_cands(spark, 0, 2000), ck, n_shards=2)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    ck.unpersist()


def test_false_positive_rate_bounded(spark, seen):
    ck = build_cuckoo(seen, n_shards=8, n_buckets=1 << 10)
    ck.cache()
    unseen = _cands(spark, 10_000, 14_000)
    fp = probe_cuckoo(unseen, ck, n_shards=8).filter(F.col("maybe_seen")).count()
    # 16-bit fingerprints: expected fpp ≈ 8/2^16 ≈ 0.0001
    assert fp / 4000 < 0.01, f"false-positive rate {fp / 4000:.4f}"
    ck.unpersist()


def test_probe_plan_has_no_broadcast_of_blobs(spark, seen):
    ck = build_cuckoo(seen, n_shards=8, n_buckets=1 << 10)
    flagged = probe_cuckoo(_cands(spark, 0, 100), ck, n_shards=8)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan


def test_incremental_merge_no_false_negatives(spark, seen):
    """merge(build(A), build(B)) must cover A ∪ B (re-insertion merge;
    slot ORDER may differ from a full build, membership may not)."""
    merged = merge_cuckoos(
        build_cuckoo(_cands(spark, 0, 1000), 8, n_buckets=1 << 10),
        build_cuckoo(_cands(spark, 1000, 2000), 8, n_buckets=1 << 10),
    )
    merged.cache()
    flagged = probe_cuckoo(_cands(spark, 0, 2000), merged, n_shards=8)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    merged.unpersist()


def test_merge_geometry_mismatch_is_an_error(spark, seen):
    a = build_cuckoo(_cands(spark, 0, 100), 4, n_buckets=1 << 10)
    b = build_cuckoo(_cands(spark, 100, 200), 4, n_buckets=1 << 11)
    with pytest.raises(Exception, match="geometry"):
        merge_cuckoos(a, b).collect()


def test_delete_removes_inserted_keys(spark, seen):
    """The capability Bloom lacks: after deleting the first 500 URLs,
    they may probe False while every remaining URL still probes True."""
    ck = build_cuckoo(seen, n_shards=4, n_buckets=1 << 10)
    after = delete_from_cuckoo(ck, _cands(spark, 0, 500))
    after.cache()
    still = probe_cuckoo(_cands(spark, 500, 2000), after, n_shards=4)
    assert still.filter(~F.col("maybe_seen")).count() == 0
    removed = probe_cuckoo(_cands(spark, 0, 500), after, n_shards=4)
    # deletes must actually free slots (a few fingerprint collisions with
    # remaining keys may still probe True — that is the documented fpp)
    assert removed.filter(~F.col("maybe_seen")).count() >= 450
    after.unpersist()


def test_dedup_cuckoo_equals_exact(spark, seen):
    ck = build_cuckoo(seen, n_shards=8, n_buckets=1 << 10)
    ck.cache()
    cands = _cands(spark, 1000, 3000)  # half seen, half new
    exact = {r["canon_url"] for r in dedup_against_seen(cands, seen).collect()}
    assert len(exact) == 1000
    for hint in (None, 10**9):
        routed = {
            r["canon_url"]
            for r in dedup_against_seen(
                cands, seen, bloom=ck, n_shards=8, seen_rows_hint=hint
            ).collect()
        }
        assert routed == exact, f"hint={hint}"
    ck.unpersist()
    spark.catalog.clearCache()


def test_crawl_cuckoo_on_equals_off(spark, tmp_path):
    """Full-crawl equivalence: the engine with the cuckoo pre-filter on
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
                 wave_seconds=60, use_bloom=True, seen_filter="cuckoo",
                 bloom_shards=4, cuckoo_buckets_per_shard=1 << 10)
    on.run(seeds=corpus["seeds"], max_waves=4)

    cols = ["url", "page_type", "http_status", "content_hash", "wave", "fetch_order"]
    a = off.results().select(cols).sort("url").collect()
    b = on.results().select(cols).sort("url").collect()
    assert a == b
    sa = {r["canon_url"] for r in off.seen().collect()}
    sb = {r["canon_url"] for r in on.seen().collect()}
    assert sa == sb
