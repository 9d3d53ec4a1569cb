"""End-to-end crawl equivalence: the Spark engine must reproduce the
pure-Python reference simulator exactly (SURVEY §5.2 / §7 contract):
(a) per-host fetch order, (b) final URL-seen set, (c) per-URL page_type
classification, (d) byte-identical extracted text per URL."""

import pandas as pd
import pytest

from ieps_crawler_spark.corpus import generate_corpus
from ieps_crawler_spark.plans.crawl import Crawler
from ieps_crawler_spark.simulator import corpus_to_sim_inputs, simulate

N_PAGES = 160
MAX_WAVES = 8


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_PAGES, seed=42)


@pytest.fixture(scope="module")
def sim(corpus):
    return simulate(*corpus_to_sim_inputs(corpus), wave_seconds=60, max_waves=MAX_WAVES)


@pytest.fixture(scope="module")
def engine(spark, corpus, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {
        r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()
    }
    crawler = Crawler(spark, pages, sites, bodies, ckpt, wave_seconds=60)
    crawler.run(seeds=corpus["seeds"], max_waves=MAX_WAVES)
    return crawler


def _engine_results(engine) -> pd.DataFrame:
    return engine.results().toPandas()


def test_seen_set_equal(engine, sim):
    got = set(r["canon_url"] for r in engine.seen().collect())
    assert got == sim.seen


def test_classification_equal(engine, sim):
    got = {
        r["url"]: r["page_type"] for r in engine.results().collect()
    }
    want = {r["url"]: r["page_type"] for r in sim.results}
    assert set(got) == set(want)
    diffs = {u: (got[u], want[u]) for u in want if got[u] != want[u]}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {list(diffs.items())[:5]}"


def test_per_host_order_equal(engine, sim):
    df = _engine_results(engine)
    df = df.sort_values(["host", "wave", "fetch_order"])
    got = df.groupby("host")["url"].apply(list).to_dict()
    assert got == sim.per_host_order


def test_text_byte_identical(engine, sim, corpus):
    df = _engine_results(engine)
    got = df[df["page_type"] == "HTML"].set_index("url")["text"].to_dict()
    want = {r["url"]: r["text"] for r in sim.results if r["page_type"] == "HTML"}
    assert got == want
    # and both equal the corpus text column (the input_hint invariant)
    corpus_text = corpus["pages"].set_index("url")["text"].to_dict()
    for u, t in got.items():
        assert t == corpus_text[u]


def test_links_equal(engine, sim):
    got = set(
        (r["from_url"], r["to_url"]) for r in engine.links().collect()
    )
    assert got == set(sim.links)


def test_status_and_hash_equal(engine, sim):
    df = _engine_results(engine)
    got = {
        r.url: (r.http_status, r.content_hash) for r in df.itertuples()
    }
    want = {r["url"]: (r["http_status"], r["content_hash"]) for r in sim.results}
    # pandas converts nullable ints to float — normalize
    got = {u: (None if s != s else int(s), h if h == h else None) for u, (s, h) in got.items()}
    want = {u: (s, h) for u, (s, h) in want.items()}
    assert got == want


def test_load_time_equal(engine, sim):
    """Deterministic load-time model column (reference page.load_time /
    r/loadTime.R analytics) — engine == simulator per URL."""
    df = _engine_results(engine)
    got = {
        r.url: (None if r.load_time_ms != r.load_time_ms else int(r.load_time_ms))
        for r in df.itertuples()
    }
    want = {r["url"]: r["load_time_ms"] for r in sim.results}
    assert got == want


def test_assets_equal(engine, sim, corpus):
    """Seed-domain download flag: asset bytes persisted iff the asset's
    host is a seed host (FrontierManagerActor.scala:95,110,129; stores
    DomainWorkerActor.scala:221-265), byte-identical to the simulator."""
    adf = engine.assets()
    assert adf is not None
    got = {
        (r["page_url"], r["asset_url"]): (
            r["kind"], bytes(r["content"]), r["content_hash"], r["n_bytes"]
        )
        for r in adf.collect()
    }
    want = {
        (a["page_url"], a["asset_url"]): (
            a["kind"], bytes(a["content"]), a["content_hash"], a["n_bytes"]
        )
        for a in sim.assets
    }
    assert set(got) == set(want)
    assert got == want
    assert len(got) > 0, "corpus produced no seed-host assets"
    # binary rows exist for non-seed hosts too, but only metadata
    res = _engine_results(engine)
    binary_hosts = set(res[res["page_type"] == "BINARY"]["host"])
    asset_hosts = {u.split("/")[2] for _, u in got}
    from ieps_crawler_spark.functions.canon import extract_domain, get_canonical

    seed_hosts = {extract_domain(get_canonical(s)) for s in corpus["seeds"]}
    assert asset_hosts <= seed_hosts
    assert binary_hosts - seed_hosts, "fixture lost non-seed binaries"


def test_metrics_present(engine):
    m = engine.metrics().toPandas()
    assert m["fetched"].sum() > 0
    assert (m.sort_values("wave")["wave"].values == range(len(m))).all()
