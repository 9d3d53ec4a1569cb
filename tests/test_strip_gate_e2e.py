"""The full param-noise loop against the crawler: a corpus polluted
with session-id URL aliases (same content, ?sid= variants) is crawled
once; param_noise learns from that crawl's (url, content_hash) log
that sid never changes content; a second crawl with
frontier_gate=strip_params collapses the aliases at discovery time —
no ?sid= URL is ever fetched again and every real URL's coverage is
unchanged. This is the operational story: crawl, learn the strip
list, crawl cheaper."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.corpus import generate_corpus
from ieps_crawler_spark.functions.canon import get_canonical
from ieps_crawler_spark.operators.urlnoise import param_noise, strip_params
from ieps_crawler_spark.plans.crawl import Crawler

N_PAGES = 120
MAX_WAVES = 14


@pytest.fixture(scope="module")
def polluted():
    """Corpus where each seed host's root page also links ?sid=
    aliases of two of its /pN/ pages, and those alias URLs exist in
    the corpus serving byte-identical content (a session id that does
    not change the page — the thing param_noise must learn)."""
    import re

    c = generate_corpus(N_PAGES, seed=11)
    pages = c["pages"].copy()
    seed_hosts = sorted(
        {re.sub(r"^https?://([^/]+).*$", r"\1", s) for s in c["seeds"]}
    )
    variants = {}  # canon variant url -> target url
    for host in seed_hosts:
        on_host = pages[
            pages["url"].str.match(rf"http://{re.escape(host)}/p\d+/$")
        ]
        targets = sorted(on_host["url"])[:2]
        anchors = ""
        for t in targets:
            for i in (1, 2):
                vurl = get_canonical(f"{t}?sid={i}")
                trow = pages[pages["url"] == t].iloc[0]
                row = {k: trow[k] for k in pages.columns}
                row["url"] = vurl
                pages.loc[len(pages)] = row
                variants[vurl] = t
                anchors += f'<a href="{t}?sid={i}">s</a>\n'
        root = f"http://{host}/"
        mask = pages["url"] == root
        assert mask.any(), f"no root page for seed host {host}"
        html = pages.loc[mask, "html"].iloc[0]
        pages.loc[mask, "html"] = html.replace(
            b"</body>", anchors.encode() + b"</body>"
        )
    assert variants, "pollution produced no variants"
    c = dict(c)
    c["pages"] = pages
    return c, variants


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


@pytest.fixture(scope="module")
def ungated(spark, polluted, tmp_path_factory):
    corpus, _ = polluted
    return _crawl(spark, corpus, str(tmp_path_factory.mktemp("noise_base")))


def test_ungated_crawl_wastes_fetches_on_aliases(ungated, polluted):
    _, variants = polluted
    got = {r["url"] for r in ungated.results().select("url").collect()}
    assert set(variants) <= got, sorted(set(variants) - got)[:4]


def test_learned_noise_then_strip_gate(spark, polluted, ungated,
                                       tmp_path_factory):
    corpus, variants = polluted
    # learn the strip list from the first crawl's own fetch log
    noise = param_noise(
        ungated.results().select("url", "content_hash")
    ).cache()
    flagged = {
        (r["host"], r["param"])
        for r in noise.filter("is_ignorable").collect()
    }
    assert flagged, "sid must be learned as ignorable"
    assert all(p == "sid" for _, p in flagged), flagged

    from ieps_crawler_spark.plans.wave import canonicalize_udf

    def strip_gate(cand):
        out = strip_params(cand, noise, "canon_url")
        # re-canonicalize: stripping can perturb the canonicalizer's
        # trailing-slash-after-query quirk for surviving params
        return out.withColumn(
            "canon_url", canonicalize_udf(F.col("canon_url"))
        )

    gated = _crawl(
        spark, corpus, str(tmp_path_factory.mktemp("noise_gated")),
        frontier_gate=strip_gate,
    )
    gated_urls = {r["url"] for r in gated.results().select("url").collect()}
    base_urls = {r["url"] for r in ungated.results().select("url").collect()}
    # no alias is ever fetched again...
    assert not (gated_urls & set(variants)), sorted(
        gated_urls & set(variants)
    )[:4]
    # ...and nothing else is lost: coverage = first crawl minus aliases
    assert gated_urls == base_urls - set(variants)
    # the seen set is smaller by exactly the collapsed aliases
    base_seen = {
        r["canon_url"]
        for r in ungated.deltas.read_all(spark, "seen_add").collect()
    }
    gated_seen = {
        r["canon_url"]
        for r in gated.deltas.read_all(spark, "seen_add").collect()
    }
    assert gated_seen == base_seen - set(variants)
    noise.unpersist()
