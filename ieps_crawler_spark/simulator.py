"""Pure-Python single-threaded reference simulator (SURVEY §5.2/§7).

This module is the EXECUTABLE DEFINITION of the ordering-equivalence
contract between the reference crawler and the Spark engine. The
reference's cross-domain schedule is random (FrontierManagerActor.scala:
184-187) and wall-clock dependent, so equivalence is defined as:

(a) per-host fetch order equals FIFO-BFS order (report/report.tex:163);
(b) final URL-seen set equal;
(c) per-URL page_type classification equal (crawldb.sql:113-119 states
    via DomainWorkerActor.scala:114-151 dispatch);
(d) extracted text per URL byte-identical.

Wave semantics (deterministic re-expression of the reference's async
loop — both this simulator and plans/wave.py implement this contract):

- State: pending frontier per host (FIFO), seen = every canon_url ever
  ENQUEUED (the reference dedups candidate links against the DB before
  enqueue, DuplicateLinks.scala:22-29, backed by UNIQUE(page.url)),
  seen content-hashes of stored HTML pages (CrawlerDIO.scala:73-86).
- Wave 0: seeds canonicalized in order; at each host's FIRST touch the
  enqueue list is [domain root] + [triggering URLs in arrival order] +
  [sitemap URLs in sitemap order] (DomainWorkerActor.scala:63-79 seeds
  the canonical domain root; FrontierManagerActor.scala:156-170 seeds
  sitemaps at site creation), deduped against seen at enqueue.
- Each wave, per host: politeness budget = max(1, wave_ms // delay_ms)
  where delay_ms is the robots Crawl-delay (ms) or 4000 default
  (SiteRobotsTxt.scala:18-30); the first `budget` FIFO entries are
  fetched; the rest stay pending.
- Classification per fetched entry: robots-disallowed → DISALLOWED (no
  fetch; DomainWorkerActor.scala:115-117); not in corpus → INVALID/404
  (HeadlessBrowser.scala:68-103); content-hash already stored → DUPLICATE
  with no link extraction (CrawlerDIO.scala:82-86 — hash-dup rows store
  no new outlinks since content is identical); else HTML (data_type 0,
  links extracted) or BINARY (images data_type 1 / docs data_type 2,
  tagged via conType).
- New links from a wave-w page enqueue into wave w+1; the enqueue order
  within (wave, host) is sorted by (parent_host, parent_rank, link_pos)
  — deterministic and expressible as a Spark window sort. Link-graph
  edges (from_url, to_url) are recorded for every extracted PAGE link,
  including links to already-seen URLs (CrawlerDIO.scala:137-156).
- fetch_order is the per-host FIFO rank within the wave; sched_ts =
  wave_start + (rank-1) * delay_ms simulates the politeness clock.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from dataclasses import dataclass, field

from .functions.canon import extract_domain, get_canonical
from .functions.extract import con_type, extract_all, extract_text
from .functions.robots import delay_ms as robots_delay_ms
from .functions.robots import is_allowed
from .functions.sitemaps import sitemap_urls

_BASE = dt.datetime(2019, 4, 1, 0, 0, 0)


@dataclass
class SimResult:
    results: list = field(default_factory=list)  # CRAWL_RESULTS-shaped dicts
    links: list = field(default_factory=list)  # (from_url, to_url) deduped
    seen: set = field(default_factory=set)
    per_host_order: dict = field(default_factory=dict)  # host -> [canon_url]
    assets: list = field(default_factory=list)  # asset-content dicts


def simulate(
    pages: dict,
    sites: dict,
    sitemap_bodies: dict,
    seeds: list[str],
    wave_seconds: int = 60,
    max_waves: int | None = None,
    max_results: int | None = None,
) -> SimResult:
    """pages: url -> {html, text}; sites: host -> (robots, sitemap);
    sitemap_bodies: sitemap_url -> body.

    Asset storage (reference download flag): binary/image content is
    persisted only when the asset's host is a SEED host — the reference
    sets downloadData=true only for domains created from the seed list
    (FrontierManagerActor.scala:95,110,129; dispatch DomainWorkerActor.
    scala:133-146, stores at :221-265). Non-seed-host binaries are still
    fetched/classified (BINARY row) but their bytes are dropped."""
    out = SimResult()
    seed_hosts = {
        extract_domain(c)
        for c in (get_canonical(s) for s in seeds)
        if c is not None
    }
    pending: dict[str, list[dict]] = {}
    known_hosts: set[str] = set()
    seen_hashes: set[str] = set()
    wave_ms = wave_seconds * 1000

    def first_touch_urls(host: str) -> tuple[list[str], list[str]]:
        root = get_canonical(host)
        robots, sitemap = sites.get(host, (None, None))
        # Off-host sitemap entries are ignored (documented divergence: the
        # reference would enqueue them on the triggering domain's worker
        # queue, FrontierManagerActor.scala:156-170 — which breaks the
        # 1-worker-per-domain politeness isolation; we route by URL host
        # and our fixtures keep sitemaps same-host so both agree).
        sm = [
            c
            for c in (get_canonical(u) for u in sitemap_urls(sitemap, sitemap_bodies))
            if c is not None and extract_domain(c) == host
        ]
        roots = [root] if root and extract_domain(root) == host else []
        return roots, sm

    def enqueue(host: str, entries: list[dict]) -> None:
        """entries arrive in deterministic order; dedup against seen."""
        if host not in known_hosts:
            known_hosts.add(host)
            roots, sms = first_touch_urls(host)
            pre = [
                {"canon_url": r, "data_type": 0, "ref_url": None, "priority": 0}
                for r in roots
            ]
            post = [
                {"canon_url": s, "data_type": 0, "ref_url": None, "priority": 0}
                for s in sms
            ]
            entries = pre + entries + post
        q = pending.setdefault(host, [])
        for e in entries:
            u = e["canon_url"]
            if u in out.seen:
                continue
            out.seen.add(u)
            q.append(e)

    # ---- wave 0: seeds ----------------------------------------------------
    by_host: dict[str, list[dict]] = {}
    host_order: list[str] = []
    for s in seeds:
        c = get_canonical(s)
        if c is None:
            continue
        h = extract_domain(c)
        if h not in by_host:
            by_host[h] = []
            host_order.append(h)
        by_host[h].append(
            {"canon_url": c, "data_type": 0, "ref_url": None, "priority": 0}
        )
    for h in host_order:
        enqueue(h, by_host[h])

    wave = 0
    links_seen: set[tuple[str, str]] = set()
    while any(pending.values()):
        if max_waves is not None and wave >= max_waves:
            break
        if max_results is not None and len(out.results) >= max_results:
            break
        wave_start = _BASE + dt.timedelta(seconds=wave * wave_seconds)
        # children collected as (host, parent_host, parent_rank, pos, entry)
        children: list[tuple] = []
        for host in sorted(h for h, q in pending.items() if q):
            robots, _ = sites.get(host, (None, None))
            dms = robots_delay_ms(robots)
            budget = max(1, wave_ms // dms)
            q = pending[host]
            batch, pending[host] = q[:budget], q[budget:]
            for rank, e in enumerate(batch, start=1):
                url = e["canon_url"]
                sched = wave_start + dt.timedelta(milliseconds=(rank - 1) * dms)
                kind = {0: "PAGE", 1: "IMG", 2: "DATA"}[e["data_type"]]
                row = {
                    "url": url,
                    "host": host,
                    "kind": kind,
                    "page_type": None,
                    "http_status": None,
                    "content_hash": None,
                    "wave": wave,
                    "fetch_order": rank,
                    "sched_ts": sched,
                    "load_time_ms": None,
                    "text": None,
                    "data_type_code": None,
                }
                out.per_host_order.setdefault(host, []).append(url)
                if not is_allowed(url, robots):
                    row["page_type"] = "DISALLOWED"
                    out.results.append(row)
                    continue
                page = pages.get(url)
                if page is None:
                    row["page_type"] = "INVALID"
                    row["http_status"] = 404
                    out.results.append(row)
                    continue
                html = page["html"]
                h256 = hashlib.sha256(html).hexdigest().upper()
                row["http_status"] = 200
                row["content_hash"] = h256
                # deterministic load-time model (see plans/wave.py)
                row["load_time_ms"] = len(html) % 4000 + 100
                if e["data_type"] == 0:
                    if h256 in seen_hashes:
                        row["page_type"] = "DUPLICATE"
                        out.results.append(row)
                        continue
                    seen_hashes.add(h256)
                    row["page_type"] = "HTML"
                    row["text"] = extract_text(html)
                    out.results.append(row)
                    # extract children
                    for item in extract_all(html, host):
                        tu = item["url"]
                        if item["kind"] == "PAGE":
                            edge = (url, tu)
                            if edge not in links_seen:
                                links_seen.add(edge)
                                out.links.append(edge)
                        th = extract_domain(tu)
                        if not th:
                            continue
                        dtp = {"PAGE": 0, "DATA": 2, "IMG": 1}[item["kind"]]
                        children.append(
                            (
                                th,
                                host,
                                rank,
                                item["pos"],
                                {
                                    "canon_url": tu,
                                    "data_type": dtp,
                                    "ref_url": url,
                                    "priority": 0,
                                },
                            )
                        )
                else:
                    row["page_type"] = "BINARY"
                    row["data_type_code"] = con_type(url)
                    out.results.append(row)
                    if host in seed_hosts:
                        out.assets.append(
                            {
                                "page_url": e["ref_url"],
                                "asset_url": url,
                                "kind": kind,
                                "content": html,
                                "content_hash": h256,
                                "n_bytes": len(html),
                            }
                        )
        # ---- enqueue children into wave+1, deterministic order ------------
        by_target: dict[str, list[tuple]] = {}
        for tup in children:
            by_target.setdefault(tup[0], []).append(tup)
        for th in sorted(by_target):
            ordered = sorted(by_target[th], key=lambda t: (t[1], t[2], t[3]))
            enqueue(th, [t[4] for t in ordered])
        wave += 1
    return out


def corpus_to_sim_inputs(corpus: dict):
    """Adapts corpus.generate_corpus output to simulate() inputs."""
    pages = {
        r["url"]: {"html": r["html"], "text": r["text"]}
        for _, r in corpus["pages"].iterrows()
    }
    sites = {
        r["host"]: (r["robots_content"], r["sitemap_content"])
        for _, r in corpus["sites"].iterrows()
    }
    bodies = {
        r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()
    }
    return pages, sites, bodies, corpus["seeds"]
