"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).

Generates the engine's input tables at any scale (seed=42 default):

- ``pages``  — input_hint shape (url, warc_ts, html, text, lang). Rows
  exist for HTML pages AND for image/binary-doc URLs (Common-Crawl WARCs
  carry all content types; html column holds the raw bytes, text null).
- ``sites``  — (host, robots_content, sitemap_content): 1/3 hosts no
  robots (allow-all default), 1/3 Disallow ~10% of paths + Crawl-delay 2,
  1/3 rules + Sitemap line; one host uses a nested sitemapindex.
- ``sitemap_bodies`` — child sitemap bodies for the nested-index host.
- ``seeds``  — the 9 gov.si-style seed URLs (CrawlerApp.scala:26-36 hosts).

Link HTML exercises every canonicalization branch (uppercase hosts,
fragments, index.html suffixes, missing scheme, trailing-slash variants,
root-relative), ~12% dead links (INVALID), ~3% byte-identical twin pages
(content-dup), onclick pseudo-links, img[src], and .pdf/.docx links.

The ``text`` column is composed by this module's own concatenation rule
(title, h1, paragraphs, anchors, in document order, single-spaced) —
independently of functions/extract.extract_text, which must reproduce it
byte-identically (the input_hint per-row invariant; asserted in tests).

Pure pandas/pyarrow — no Spark needed, so bench/test setup is cheap.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random

import pandas as pd

SEED_HOSTS = [
    "evem.gov.si", "e-uprava.gov.si", "podatki.gov.si", "e-prostor.gov.si",
    "evode.gov.si", "fu.gov.si", "mo.gov.si", "arso.gov.si", "mirs.gov.si",
]
EXTRA_HOSTS = ["nio.gov.si", "stat.gov.si", "pisrs.gov.si"]
ALL_HOSTS = SEED_HOSTS + EXTRA_HOSTS

_WORDS = (
    "upravna enota portal storitev obrazec vloga podatki register drzavni "
    "organ objava narocilo sistem uporabnik dostop prijava odlocba zakon "
    "clen postopek rok oddaja potrdilo evidenca sektor urad sluzba"
).split()

_BASE_TS = dt.datetime(2019, 4, 1, 0, 0, 0)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _zipf_counts(total: int, n_hosts: int, s: float = 1.2) -> list[int]:
    weights = [1.0 / (i + 1) ** s for i in range(n_hosts)]
    z = sum(weights)
    counts = [max(2, int(round(total * w / z))) for w in weights]
    return counts


def _variant(rng: random.Random, canon_url: str, host: str) -> str:
    """A raw href that canonicalizes back to canon_url (dir-style URLs)."""
    assert canon_url.endswith("/")
    bare = canon_url[:-1]
    path = canon_url[len("http://" + host) :]  # starts with /
    v = rng.randrange(7)
    if v == 0:
        return canon_url
    if v == 1:
        return bare  # missing trailing slash
    if v == 2:
        return path.rstrip("/") or "/"  # root-relative → domain fallback
    if v == 3:
        return "http://" + host.upper() + path  # uppercase host
    if v == 4:
        return bare + "#sekcija"  # fragment
    if v == 5:
        return canon_url + "index.html"  # default index page
    return bare[len("http://") :]  # missing scheme


def generate_corpus(n_pages: int = 300, seed: int = 42):
    """Returns dict(pages=DataFrame, sites=DataFrame, sitemap_bodies=DataFrame,
    seeds=list[str])."""
    rng = random.Random(seed)
    counts = _zipf_counts(n_pages, len(ALL_HOSTS))

    # ---- URL universe per host ------------------------------------------
    host_pages: dict[str, list[str]] = {}
    disallowed_paths: dict[str, list[str]] = {}
    sitemap_only: dict[str, list[str]] = {}
    for hi, host in enumerate(ALL_HOSTS):
        n = counts[hi]
        urls = [f"http://{host}/"]
        for i in range(n):
            if i % 10 == 7:  # ~10% under /private → robots-disallowed
                urls.append(f"http://{host}/private/p{i}/")
            else:
                urls.append(f"http://{host}/p{i}/")
        host_pages[host] = urls
        disallowed_paths[host] = [u for u in urls if "/private/" in u]
        # sitemap-only discoveries: in corpus, never linked
        sitemap_only[host] = [f"http://{host}/sm{i}/" for i in range(max(1, n // 10))]

    all_urls = {u for us in host_pages.values() for u in us}
    for us in sitemap_only.values():
        all_urls.update(us)

    # ---- sites / robots / sitemaps --------------------------------------
    sites_rows, sm_bodies = [], []
    for hi, host in enumerate(ALL_HOSTS):
        group = hi % 3
        robots = None
        sitemap = None
        if group >= 1:
            robots = (
                "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n"
            )
        if group == 2:
            sm_url = f"http://{host}/sitemap.xml"
            robots += f"Sitemap: {sm_url}\n"
            listed = host_pages[host][1 : 1 + 3] + sitemap_only[host]
            if hi == 2:  # one nested sitemapindex host (FIXTURES §2)
                half = len(listed) // 2 or 1
                c1, c2 = f"http://{host}/sm_a.xml", f"http://{host}/sm_b.xml"
                sitemap = (
                    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                    f"<sitemap><loc>{c1}</loc></sitemap>"
                    f"<sitemap><loc>{c2}</loc></sitemap></sitemapindex>"
                )
                for curl, chunk in ((c1, listed[:half]), (c2, listed[half:])):
                    body = "<urlset>" + "".join(
                        f"<url><loc>{u}</loc></url>" for u in chunk
                    ) + "</urlset>"
                    sm_bodies.append({"url": curl, "content": body})
            else:
                sitemap = "<urlset>" + "".join(
                    f"<url><loc>{u}</loc></url>" for u in listed
                ) + "</urlset>"
        sites_rows.append(
            {"host": host, "robots_content": robots, "sitemap_content": sitemap}
        )

    # ---- page HTML + text ------------------------------------------------
    rows = []
    twin_src: list[tuple[bytes, str]] = []  # (html, text) pool for twins
    seq = 0
    for hi, host in enumerate(ALL_HOSTS):
        urls = host_pages[host]
        n = len(urls)
        for pi, url in enumerate(urls):
            # ~3% byte-identical twins (content-dup, CrawlerDIO.scala:82-86)
            if twin_src and rng.random() < 0.03:
                html, text = twin_src[rng.randrange(len(twin_src))]
            else:
                title = _sentence(rng, 3)
                h1 = _sentence(rng, 2)
                paras = [_sentence(rng, rng.randint(4, 12)) for _ in range(rng.randint(1, 3))]
                parts = [
                    f"<html><head><title>{title}</title>",
                    '<style>body { margin: 0 }</style>',
                    '<script>var q = 1;</script></head><body>',
                    f"<h1>{h1}</h1>",
                ]
                text_parts = [title, h1]
                for p in paras:
                    parts.append(f"<p>{p}</p>")
                    text_parts.append(p)
                # links
                n_links = rng.randint(3, 9)
                for li in range(n_links):
                    r = rng.random()
                    if r < 0.12:  # dead link → INVALID
                        target = f"http://{host}/dead{rng.randrange(10_000)}/"
                    elif r < 0.32:  # cross-host
                        oh = ALL_HOSTS[rng.randrange(len(ALL_HOSTS))]
                        target = host_pages[oh][rng.randrange(len(host_pages[oh]))]
                    else:  # intra-host
                        target = urls[rng.randrange(n)]
                    href = _variant(rng, target, host) if target.endswith("/") else target
                    anchor = _sentence(rng, 2)
                    parts.append(f'<a href="{href}">{anchor}</a>')
                    text_parts.append(anchor)
                # occasionally an onclick pseudo-link (ExtractFromHTML:66-80)
                if rng.random() < 0.3:
                    target = urls[rng.randrange(n)]
                    ctext = _sentence(rng, 2)
                    parts.append(f'<div onclick="{target}">{ctext}</div>')
                    text_parts.append(ctext)
                # binary-doc links (~20% of pages)
                if rng.random() < 0.2:
                    ext = rng.choice(["pdf", "doc", "docx", "ppt", "pptx"])
                    dto = f"http://{host}/files/f{rng.randrange(50)}.{ext}"
                    anchor = _sentence(rng, 1)
                    parts.append(f'<a href="{dto}">{anchor}</a>')
                    text_parts.append(anchor)
                    all_urls.add(dto)
                # images (0-2)
                for ii in range(rng.randrange(3)):
                    img = f"http://{host}/img/i{rng.randrange(40)}.png"
                    parts.append(f'<img src="{img}">')
                    all_urls.add(img)
                parts.append("</body></html>")
                # newline separators are the inter-block whitespace the
                # text spec collapses to single spaces
                html = "\n".join(parts).encode("utf-8")
                text = " ".join(text_parts)
                if rng.random() < 0.5:
                    twin_src.append((html, text))
            rows.append(
                {
                    "url": url,
                    "warc_ts": _BASE_TS + dt.timedelta(seconds=seq),
                    "html": html,
                    "text": text,
                    "lang": "sl" if rng.random() < 0.9 else "en",
                    }
            )
            seq += 1
        for u in sitemap_only[host]:
            body = (
                "<html><head><title>sm</title></head>\n<body>\n<p>"
                + _sentence(rng, 5)
                + "</p>\n</body></html>"
            )
            rows.append(
                {
                    "url": u,
                    "warc_ts": _BASE_TS + dt.timedelta(seconds=seq),
                    "html": body.encode(),
                    "text": "sm " + body.split("<p>")[1].split("</p>")[0],
                    "lang": "sl",
                }
            )
            seq += 1

    # asset bodies (images / binary docs referenced above)
    for u in sorted(all_urls):
        if u.endswith((".png", ".pdf", ".doc", ".docx", ".ppt", ".pptx")):
            payload = hashlib.sha256(u.encode()).digest() * 4
            rows.append(
                {
                    "url": u,
                    "warc_ts": _BASE_TS + dt.timedelta(seconds=seq),
                    "html": payload,
                    "text": None,
                    "lang": None,
                }
            )
            seq += 1

    pages = pd.DataFrame(rows)
    sites = pd.DataFrame(sites_rows)
    bodies = pd.DataFrame(sm_bodies, columns=["url", "content"])
    seeds = [f"http://{h}" for h in SEED_HOSTS]
    return {"pages": pages, "sites": sites, "sitemap_bodies": bodies, "seeds": seeds}


def write_corpus(out_dir: str, n_pages: int = 300, seed: int = 42) -> dict:
    import os

    os.makedirs(out_dir, exist_ok=True)
    c = generate_corpus(n_pages, seed)
    for name in ("pages", "sites", "sitemap_bodies"):
        c[name].to_parquet(f"{out_dir}/{name}.parquet", index=False)
    with open(f"{out_dir}/seeds.txt", "w") as f:
        f.write("\n".join(c["seeds"]))
    return c
