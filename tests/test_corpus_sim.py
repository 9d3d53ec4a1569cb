"""Corpus generator invariants + simulator smoke/semantics tests."""

import hashlib

from ieps_crawler_spark.corpus import ALL_HOSTS, SEED_HOSTS, generate_corpus
from ieps_crawler_spark.functions.canon import get_canonical
from ieps_crawler_spark.functions.extract import extract_text
from ieps_crawler_spark.simulator import corpus_to_sim_inputs, simulate


def test_corpus_text_invariant():
    """input_hint per-row invariant: extract_text(html) == text byte-identical."""
    c = generate_corpus(200, seed=42)
    pages = c["pages"]
    html_rows = pages[pages["text"].notna()]
    assert len(html_rows) > 100
    for _, r in html_rows.iterrows():
        assert extract_text(r["html"]) == r["text"], r["url"]


def test_corpus_urls_canonical():
    c = generate_corpus(150, seed=42)
    for u in c["pages"]["url"]:
        assert get_canonical(u) == u, u


def test_corpus_determinism():
    a = generate_corpus(100, seed=42)
    b = generate_corpus(100, seed=42)
    assert a["pages"]["url"].tolist() == b["pages"]["url"].tolist()
    assert (a["pages"]["html"] == b["pages"]["html"]).all()


def test_corpus_has_twins_and_robots_variety():
    c = generate_corpus(400, seed=42)
    pages = c["pages"]
    html_rows = pages[pages["text"].notna()]
    hashes = html_rows["html"].map(lambda b: hashlib.sha256(b).hexdigest())
    assert hashes.duplicated().any()  # content-dup twins exist
    sites = c["sites"]
    assert sites["robots_content"].isna().sum() >= 3
    assert sites["sitemap_content"].notna().sum() >= 3
    assert any(
        s and "sitemapindex" in s for s in sites["sitemap_content"] if s
    )
    assert len(c["sitemap_bodies"]) == 2


def test_simulator_end_to_end():
    c = generate_corpus(200, seed=42)
    pages, sites, bodies, seeds = corpus_to_sim_inputs(c)
    sim = simulate(pages, sites, bodies, seeds, wave_seconds=60, max_waves=12)
    types = {}
    for r in sim.results:
        types[r["page_type"]] = types.get(r["page_type"], 0) + 1
    # all six lifecycle states minus FRONTIER (pending) must occur
    assert types.get("HTML", 0) > 50
    assert types.get("INVALID", 0) > 0
    assert types.get("DISALLOWED", 0) > 0
    assert types.get("DUPLICATE", 0) > 0
    assert types.get("BINARY", 0) > 0
    # seen contains every fetched url and every result url is unique
    urls = [r["url"] for r in sim.results]
    assert len(urls) == len(set(urls))
    assert set(urls) <= sim.seen
    # per-host order: ranks are FIFO within waves
    for host, order in sim.per_host_order.items():
        assert len(order) == len(set(order))
    # seed hosts were touched
    for h in SEED_HOSTS:
        assert h in sim.per_host_order
    # cross-host discovery reached non-seed hosts
    assert any(h in sim.per_host_order for h in ALL_HOSTS[9:])
    # link edges reference crawled pages
    assert len(sim.links) > 50


def test_simulator_politeness_budget():
    c = generate_corpus(300, seed=42)
    pages, sites, bodies, seeds = corpus_to_sim_inputs(c)
    sim = simulate(pages, sites, bodies, seeds, wave_seconds=60, max_waves=3)
    # delay: robots hosts 2000ms → 30/wave; default 4000ms → 15/wave
    per_host_wave = {}
    for r in sim.results:
        per_host_wave.setdefault((r["host"], r["wave"]), 0)
        per_host_wave[(r["host"], r["wave"])] += 1
    robots = {r["host"]: r["robots_content"] for _, r in c["sites"].iterrows()}
    for (host, wave), n in per_host_wave.items():
        cap = 30 if (robots.get(host) and "Crawl-delay: 2" in robots[host]) else 15
        assert n <= cap, (host, wave, n)


def test_simulator_deterministic():
    c = generate_corpus(150, seed=42)
    args = corpus_to_sim_inputs(c)
    a = simulate(*args, wave_seconds=60, max_waves=6)
    b = simulate(*args, wave_seconds=60, max_waves=6)
    assert [r["url"] for r in a.results] == [r["url"] for r in b.results]
    assert a.links == b.links and a.seen == b.seen
