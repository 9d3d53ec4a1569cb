"""One crawl wave as a declarative DataFrame pipeline (SURVEY §3.1 Spark
lifecycle / §7 step 5). Implements exactly the contract defined by
``simulator.simulate`` — same classification, per-host FIFO order, and
enqueue-order rules — with Catalyst-friendly operators:

frontier → politeness top-k (window rank ≤ budget)
         → corpus join ("fetch": frontier ⋈ pages — the hot join; the
           corpus side never shuffles: bucketed-by-url scan (Iceberg
           bucket transform / parquet bucketBy) so only the batch moves,
           or opt-in broadcast-of-batch for unbucketed corpora)
         → robots gate (broadcast sites dim + Arrow UDF)
         → status gate + sha2 content hash (JVM-side, whole-stage codegen)
         → text+link extraction (Arrow UDF) fused into the fetch stage —
           html dies there, nothing html-bearing is ever cached
         → hash-dup marking (window first-wins + prior-hash join, unique
           surrogate keys for ineligible rows so no NULL-key partition)
         → explode links
         → URL-seen dedup (exact anti-join; optional sharded-Bloom routing)
         → first-touch injections (domain root + sitemap seeding)
         → next frontier with deterministic enq_seq

Column hygiene mirrors the reference's (DomainWorkerActor.scala:185-199
strips htmlContent before re-enqueue): ``html`` never crosses the
extraction boundary — only text/links/hash columns flow on.

enq_seq encoding: (group << 40) | local, group 0 = domain root,
1 = triggered links (local = row_number by parent_host, parent_rank,
link pos), 2 = sitemap entries (local = sitemap position). FIFO per host
across waves = ORDER BY (priority, wave, enq_seq).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.canon import canonicalize_udf, extract_domain_udf
from ..functions.extract import con_type_udf, extract_page_udf
from ..functions.robots import robots_allowed_udf
from ..operators.politeness import host_delays, select_budget
from ..operators.seen import dedup_against_seen

GROUP_ROOT, GROUP_LINK, GROUP_SITEMAP = 0, 1, 2
_GROUP_SHIFT = 40


@dataclass
class WaveOutput:
    results: DataFrame  # CRAWL_RESULTS rows of this wave
    links: DataFrame  # distinct new (from_url, to_url) edges of this wave
    pending_next: DataFrame  # frontier for wave+1 (leftover ∪ new entries)
    seen_add: DataFrame  # canon_urls newly enqueued
    hashes_add: DataFrame  # content hashes newly stored (HTML originals)
    hosts_add: DataFrame  # hosts first touched this wave
    assets: DataFrame | None = None  # seed-host binary/image payloads
    # html-free twin of the assets filter over the CACHED staged frame:
    # probing it costs a cache scan, never the corpus re-join — the
    # crawl loop uses it to skip the assets write when a wave's binary
    # fetches all landed on non-seed hosts
    assets_probe: DataFrame | None = None


ASSETS_SCHEMA = (
    "page_url string, asset_url string, kind string, content binary, "
    "content_hash string, n_bytes long"
)


def seed_frontier(spark, seeds: list[str] | DataFrame) -> DataFrame:
    """Wave-0 trigger rows (group 1, local = seed position). The crawl
    driver applies inject_first_touch to these before wave 0 runs, so the
    seed hosts get their [root] + seeds + [sitemap] enqueue order exactly
    like any host first touched mid-crawl.

    ``seeds`` is either a Python list (the reference's 9-URL case,
    CrawlerApp.scala:26-36) or a DataFrame with columns (url, pos) — the
    scalable path for seed lists that are themselves tables (a 10^10
    crawl seeds from a table, not a driver-side list)."""
    if isinstance(seeds, DataFrame):
        return (
            seeds.withColumn("canon_url", canonicalize_udf("url"))
            .filter(F.col("canon_url").isNotNull())
            .select(
                "canon_url",
                extract_domain_udf("canon_url").alias("host"),
                F.lit(0).alias("data_type"),
                F.lit(None).cast("string").alias("ref_url"),
                F.lit(0).alias("wave"),
                F.lit(0).alias("priority"),
                (F.lit(GROUP_LINK << _GROUP_SHIFT) + F.col("pos"))
                .cast("long")
                .alias("enq_seq"),
            )
        )
    from ..functions.canon import extract_domain, get_canonical

    rows = []
    for i, s in enumerate(seeds):
        c = get_canonical(s)
        if c is None:
            continue
        h = extract_domain(c)
        rows.append((c, h, 0, None, 0, 0, (GROUP_LINK << _GROUP_SHIFT) | i))
    return spark.createDataFrame(
        rows,
        "canon_url string, host string, data_type int, ref_url string, "
        "wave int, priority int, enq_seq long",
    )


def build_first_touch_template(
    sites: DataFrame, sitemap_bodies: dict[str, str] | None
) -> DataFrame:
    """Static per-host first-touch rows (root + sitemap entries), computed
    ONCE per crawl — robots/sitemap content never changes mid-crawl, so
    re-running the sitemap-parse and canonicalize UDFs every wave (as the
    first implementation did) just re-pays Arrow stage setup. Columns:
    (host, canon_url, enq_seq); wave is stamped at injection time."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    bodies = dict(sitemap_bodies or {})

    def _sm_series(content):
        import pandas as pd

        from ..functions.sitemaps import sitemap_urls

        return pd.Series([sitemap_urls(c, bodies) for c in content])

    sitemap_urls_udf = pandas_udf(_sm_series, ArrayType(StringType()))

    roots = (
        sites.select("host", canonicalize_udf("host").alias("canon_url"))
        .filter(F.col("canon_url").isNotNull())
        .filter(extract_domain_udf("canon_url") == F.col("host"))
        .select(
            "host", "canon_url",
            F.lit(GROUP_ROOT << _GROUP_SHIFT).cast("long").alias("enq_seq"),
        )
    )
    sitemaps = (
        sites.filter(F.col("sitemap_content").isNotNull())
        .select(
            "host",
            F.posexplode(sitemap_urls_udf("sitemap_content")).alias("pos", "raw_url"),
        )
        .withColumn("canon_url", canonicalize_udf("raw_url"))
        .filter(F.col("canon_url").isNotNull())
        # off-host sitemap entries ignored (see simulator.first_touch_urls)
        .filter(extract_domain_udf("canon_url") == F.col("host"))
        .select(
            "host", "canon_url",
            (F.lit(GROUP_SITEMAP << _GROUP_SHIFT) + F.col("pos")).cast("long").alias("enq_seq"),
        )
    )
    return roots.unionByName(sitemaps)


def inject_first_touch(
    candidates: DataFrame,
    known_hosts: DataFrame,
    sites: DataFrame,
    sitemap_bodies: dict[str, str],
    next_wave: int,
    template: DataFrame | None = None,
    prune_host_dims: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Returns (injected frontier rows, new_hosts). candidates are the
    already-deduped new frontier rows for next_wave.

    With a precomputed ``template`` the per-wave cost is one broadcast
    join on host (no UDF stages). Hosts absent from ``sites`` (discovered
    mid-crawl without a site row) fall back to a canonicalize-UDF root —
    that path only sees the (small) set of genuinely new unknown hosts.

    ``prune_host_dims=True`` is the huge-dim mode: instead of
    broadcasting the full template / sites-host dim (which scales with
    TOTAL known hosts — 10^7-10^8 at frontier scale), both dims are
    left_semi-pruned to THIS wave's new hosts first, so everything that
    moves is bounded by the wave's discovery, and AQE picks broadcast vs
    shuffle from the pruned runtime sizes. Output is identical either
    way (tests/test_dim_prune.py)."""
    new_hosts = (
        candidates.select("host").distinct().join(known_hosts, "host", "left_anti")
    )
    if template is None:
        template = build_first_touch_template(sites, sitemap_bodies)
    if prune_host_dims:
        # one scan of each dim per wave, pruned to the wave's new hosts
        # before anything is joined back — no total-hosts-sized
        # broadcast. The semi-join IS the prune-and-match in one step
        # (new_hosts carries only the host column, so joining it back
        # inner would add a stage and change nothing).
        templated = template.join(new_hosts, "host", "left_semi")
        known_site_hosts = sites.select("host").join(
            new_hosts, "host", "left_semi"
        )
        unknown = new_hosts.join(known_site_hosts, "host", "left_anti")
    else:
        templated = new_hosts.join(F.broadcast(template), "host", "inner")
        unknown = new_hosts.join(
            F.broadcast(sites.select("host")), "host", "left_anti"
        )
    unknown_roots = (
        unknown.select("host", canonicalize_udf("host").alias("canon_url"))
        .filter(F.col("canon_url").isNotNull())
        .filter(extract_domain_udf("canon_url") == F.col("host"))
        .select(
            "host", "canon_url",
            F.lit(GROUP_ROOT << _GROUP_SHIFT).cast("long").alias("enq_seq"),
        )
    )
    injected = templated.unionByName(unknown_roots).select(
        "canon_url",
        "host",
        F.lit(0).alias("data_type"),
        F.lit(None).cast("string").alias("ref_url"),
        F.lit(next_wave).alias("wave"),
        F.lit(0).alias("priority"),
        F.col("enq_seq"),
    )
    return injected, new_hosts


def run_wave(
    spark,
    wave: int,
    pending: DataFrame,
    pages: DataFrame,
    sites: DataFrame,
    seen: DataFrame,
    seen_hashes: DataFrame,
    known_hosts: DataFrame,
    sitemap_bodies: dict[str, str] | None = None,
    wave_seconds: int = 60,
    bloom: DataFrame | None = None,
    bloom_shards: int | None = None,
    delays: DataFrame | None = None,
    first_touch_template: DataFrame | None = None,
    broadcast_fetch: bool = False,
    politeness_salt_shards: int = 0,
    seed_hosts: DataFrame | None = None,
    seen_rows_hint: int | None = None,
    priority_expr=None,
    priority_table: DataFrame | None = None,
    max_urls: int | None = None,
    prune_host_dims: bool = False,
    fetcher=None,
    frontier_gate=None,
) -> WaveOutput:
    # ---- 1. politeness top-k selection ----------------------------------
    # delays/template are static dims — callers that loop waves pass them
    # in precomputed+cached (crawl.Crawler does) so no robots/sitemap UDF
    # re-runs per wave.
    # prune_host_dims is the huge-dim mode (dim rows scale with TOTAL
    # discovered hosts, not wave size): every sites-derived dim is either
    # joined without a broadcast hint (delays — the politeness window
    # reuses the join's host clustering) or left_semi-pruned to the hosts
    # actually present in this wave before joining (robots bodies,
    # first-touch template), so nothing total-hosts-sized is ever
    # broadcast. Crawler flips it automatically past
    # host_dim_broadcast_limit.
    if delays is None:
        delays = host_delays(sites)
    batch, leftover = select_budget(
        pending, delays, wave, wave_seconds,
        salt_shards=politeness_salt_shards, max_urls=max_urls,
        broadcast_delays=not prune_host_dims,
    )

    # ---- 2. fetch = corpus ⋈ broadcast(batch) (missing → 404) ------------
    # The corpus side is the 100 TB table — it must NEVER shuffle (a plain
    # frontier-left-outer join sort-merges BOTH sides, moving every html
    # byte of the corpus every wave; the left-outer shape also forbids
    # broadcasting the small side). Instead: stream the corpus in place
    # against a broadcast of the (slim, html-less) batch — one corpus scan,
    # zero corpus shuffle — then recover the 404 misses with a broadcast
    # anti-join against the hit keys. Both broadcasts are politeness-batch-
    # sized (bounded by the wave budget), never corpus-sized. On a cluster
    # where a wave batch outgrows broadcast limits, bucket the Iceberg
    # corpus by url hash instead: a storage-partitioned join gives the same
    # no-corpus-shuffle property (broadcast_fetch=False keeps the shuffled
    # join for that layout).
    # fetcher injection point (SURVEY O4 production mapping): any
    # callable batch -> batch+html — e.g. sources.fetcher.http_fetcher's
    # mapInPandas live-HTTP stage — replaces the corpus join wholesale;
    # everything downstream (robots gate, classify, extract, dedup) is
    # fetch-source-agnostic.
    if prune_host_dims:
        # The robots-dim pruning below re-reads `batch` for its distinct
        # hosts; without this cache that second consumer would re-run
        # the whole politeness selection window.
        batch.cache()
    if fetcher is not None:
        fetched = fetcher(batch)
    else:
        corpus = pages.select(F.col("url").alias("canon_url"), "html")
        if broadcast_fetch:
            batch.cache()  # consumed by the fetch join, miss anti-join, union
            hits = corpus.join(F.broadcast(batch), "canon_url", "inner")
            # cache the KEYS only: caching `hits` itself would columnar-
            # encode every fetched page's html — the module's never-
            # cache-html trap (measured 5-10x the join's cost). The
            # union side re-derives hits lazily like the shuffled path.
            hit_keys = hits.select("canon_url")
            hit_keys.cache()
            miss = batch.join(
                F.broadcast(hit_keys), "canon_url", "left_anti"
            )
            fetched = hits.unionByName(
                miss.withColumn("html", F.lit(None).cast("binary"))
            )
        else:
            fetched = batch.join(corpus, "canon_url", "left")

    # ---- 3. robots gate (broadcast dim + Arrow UDF) ----------------------
    # robots bodies are KBs per host: a full-dim broadcast scales with
    # TOTAL discovered hosts, so the huge-dim mode prunes the dim to the
    # batch's distinct hosts first (bounded by the politeness budget /
    # max_urls) and lets AQE pick the join strategy from the pruned size.
    robots_dim = sites.select("host", "robots_content")
    if prune_host_dims:
        batch_hosts = batch.select("host").distinct()
        robots_dim = robots_dim.join(batch_hosts, "host", "left_semi")
        fetched = fetched.join(robots_dim, "host", "left")
    else:
        fetched = fetched.join(F.broadcast(robots_dim), "host", "left")
    fetched = fetched.withColumn(
        "allowed", robots_allowed_udf("canon_url", "robots_content")
    ).drop("robots_content")

    # ---- 4. status + content hash (JVM-side) -----------------------------
    # An injected http_fetcher carries the REAL wire status in
    # fetch_status (ref:utils/HeadlessBrowser.scala:68-103 stores
    # per-status failures); the corpus join has no such column and a
    # miss is a 404 — identical to the legacy behavior.
    miss_status = (
        F.coalesce(F.col("fetch_status"), F.lit(404))
        if "fetch_status" in fetched.columns
        else F.lit(404)
    )
    fetched = fetched.withColumn(
        "http_status",
        F.when(~F.col("allowed"), F.lit(None).cast("int"))
        .when(F.col("html").isNull(), miss_status)
        .otherwise(F.lit(200)),
    ).withColumn(
        "content_hash",
        F.when(
            F.col("allowed") & F.col("html").isNotNull(),
            F.upper(F.sha2(F.col("html"), 256)),
        ),
    ).withColumn(
        # deterministic load-time model (reference stores live fetch
        # latency, page.load_time crawldb.sql:36 / r/loadTime.R): latency
        # correlates with payload size; null when nothing was fetched
        "load_time_ms",
        F.when(
            F.col("allowed") & F.col("html").isNotNull(),
            F.pmod(F.length("html"), F.lit(4000)) + F.lit(100),
        ).cast("long"),
    )

    # ---- 4b. asset persistence (seed-domain download flag) ---------------
    # the reference stores image/binary CONTENT only for seed domains
    # (downloadData, FrontierManagerActor.scala:95,110,129; stores at
    # DomainWorkerActor.scala:221-265; tables crawldb.sql:47-70). This
    # branch reads the uncached html-bearing `fetched` frame — asset bytes
    # deliberately never enter the staged cache (html-cache perf trap);
    # the write recomputes the fetch join for the (small) binary
    # seed-host sub-batch only.
    assets = None
    if seed_hosts is not None:
        assets = (
            fetched.filter(
                F.col("allowed")
                & F.col("html").isNotNull()
                & (F.col("data_type") != 0)
            )
            .join(F.broadcast(seed_hosts.select("host")), "host", "left_semi")
            .select(
                F.col("ref_url").alias("page_url"),
                F.col("canon_url").alias("asset_url"),
                F.when(F.col("data_type") == 1, F.lit("IMG"))
                .otherwise(F.lit("DATA")).alias("kind"),
                F.col("html").alias("content"),
                F.col("content_hash"),
                F.length("html").cast("long").alias("n_bytes"),
            )
        )

    # ---- 5. extraction fused into the fetch stage ------------------------
    # The html bytes die HERE, inside the same stage as the corpus join:
    # one Arrow pass computes (text, links) for HTML candidates (null html
    # short-circuits in the UDF), and every downstream consumer sees only
    # the slim projection. Caching anything html-bearing is a trap — the
    # columnar cache re-encodes/compresses the blobs, which measured 5-10x
    # the cost of the whole join at bench scale.
    is_cand = (
        F.col("allowed") & F.col("html").isNotNull() & (F.col("data_type") == 0)
    )
    staged = fetched.withColumn(
        "_page", extract_page_udf(F.when(is_cand, F.col("html")), "host")
    ).select(
        "canon_url",
        "host",
        "data_type",
        "wave",
        "fetch_order",
        "sched_ts",
        "http_status",
        "content_hash",
        "load_time_ms",
        "allowed",
        F.col("_page.text").alias("text"),
        F.col("_page.links").alias("links"),
    )

    # ---- 6. duplicate marking (first-wins, cross- and intra-wave) --------
    # global deterministic order inside a wave = (host, fetch_order) —
    # matching the simulator's sorted-host sweep.
    # only allowed HTML-candidate rows participate in hash ranking — binary
    # rows never mark or become DUPLICATEs (simulator contract; the
    # reference's hash-dup path is the page insert, CrawlerDIO.scala:82-86)
    eligible = (
        F.col("allowed") & (F.col("data_type") == 0) & F.col("content_hash").isNotNull()
    )
    # ineligible rows must NOT share a window key: a null key would hash
    # every INVALID/BINARY/DISALLOWED row of the wave into ONE window
    # partition — a single-task sort proportional to wave size (measured:
    # the whole pipeline stopped scaling past 8 cores). A per-row unique
    # key gives them 1-row partitions; their rank is masked to null below.
    staged = staged.withColumn(
        "_dup_key",
        F.when(eligible, F.col("content_hash")).otherwise(
            F.concat(F.lit("\0"), F.col("canon_url"))
        ),
    )
    dup_w = Window.partitionBy("_dup_key").orderBy("host", "fetch_order")
    prior = seen_hashes.select(F.col("content_hash").alias("_prior_hash"))
    staged = (
        staged.withColumn("_rn", F.when(eligible, F.row_number().over(dup_w)))
        # join the prior-hash set on the same surrogate key: null hashes
        # would otherwise pile into one shuffle partition here too (the
        # "\0" prefix can never match a real hex hash, so null-hash rows
        # simply pass through the left join, evenly distributed)
        .join(
            prior,
            F.col("_dup_key") == F.col("_prior_hash"),
            "left",
        )
        .drop("_dup_key")
        .withColumn("_hash_seen", F.col("_prior_hash").isNotNull())
        .drop("_prior_hash")
    )
    staged = staged.withColumn(
        "page_type",
        F.when(~F.col("allowed"), F.lit("DISALLOWED"))
        # any failed fetch is INVALID, carrying its real status (404 on
        # the corpus path; 400/500/413/... from a status-shaped fetcher
        # — the reference's per-status INVALID breakdown)
        .when(F.col("http_status") != 200, F.lit("INVALID"))
        .when(
            (F.col("data_type") == 0) & (F.col("_hash_seen") | (F.col("_rn") > 1)),
            F.lit("DUPLICATE"),
        )
        .when(F.col("data_type") == 0, F.lit("HTML"))
        .otherwise(F.lit("BINARY")),
    ).withColumn(
        "kind",
        F.when(F.col("data_type") == 0, F.lit("PAGE"))
        .when(F.col("data_type") == 1, F.lit("IMG"))
        .otherwise(F.lit("DATA")),
    )
    # staged feeds results, link edges, frontier candidates and hash adds —
    # cache once, post-classification, html-free (freed by the driver's
    # per-wave clearCache())
    staged.cache()

    # html-free twin of the assets filter (content_hash is non-null
    # exactly when allowed & html was present): lets the crawl loop
    # test "did any binary land on a SEED host" against the cache
    # instead of paying the corpus re-join to find out it was empty
    assets_probe = None
    if seed_hosts is not None:
        assets_probe = (
            staged.filter(
                F.col("allowed")
                & (F.col("data_type") != 0)
                & F.col("content_hash").isNotNull()
            )
            .join(F.broadcast(seed_hosts.select("host")), "host", "left_semi")
            .select("canon_url")
        )

    results = staged.select(
        F.col("canon_url").alias("url"),
        "host",
        "kind",
        "page_type",
        "http_status",
        "content_hash",
        F.lit(wave).alias("wave"),
        "fetch_order",
        "sched_ts",
        "load_time_ms",
        # DUPLICATE rows store the link only, never their parse output
        # (DomainWorkerActor.scala:165-171)
        F.when(F.col("page_type") == "HTML", F.col("text")).alias("text"),
        F.when(
            F.col("page_type") == "BINARY", con_type_udf("canon_url")
        ).alias("data_type_code"),
    )

    # ---- 7. children: explode links → link edges + frontier candidates ---
    extracted = staged.filter(F.col("page_type") == "HTML")
    children = extracted.select(
        F.col("canon_url").alias("parent_url"),
        F.col("host").alias("parent_host"),
        F.col("fetch_order").alias("parent_rank"),
        F.explode("links").alias("l"),
    ).select(
        "parent_url",
        "parent_host",
        "parent_rank",
        F.col("l.url").alias("canon_url"),
        F.col("l.kind").alias("child_kind"),
        F.col("l.pos").alias("pos"),
    )

    links = (
        children.filter(F.col("child_kind") == "PAGE")
        .select(F.col("parent_url").alias("from_url"), F.col("canon_url").alias("to_url"))
        .dropDuplicates(["from_url", "to_url"])
    )

    cand = (
        children.withColumn("host", extract_domain_udf("canon_url"))
        .filter(F.col("host") != "")
        .withColumn(
            "data_type",
            F.when(F.col("child_kind") == "PAGE", 0)
            .when(F.col("child_kind") == "IMG", 1)
            .otherwise(2),
        )
    )
    # frontier gate (UT1-blocklist-style curation at DISCOVERY time):
    # a boolean Column over (canon_url, host, data_type) — TRUE keeps —
    # or a DataFrame->DataFrame transform for join-shaped gates (the
    # functions/urlfilter.classify_urls scale path). Applied BEFORE the
    # first-wins window and the seen anti-join, so blocked URLs never
    # consume a dedup slot, never enter the seen set, and can be
    # unblocked in a later crawl. Seeds and first-touch injections are
    # operator-provided and bypass the gate (matching how the reference
    # treats its seed list as trusted).
    if frontier_gate is not None:
        if callable(frontier_gate):
            cand = frontier_gate(cand)
        else:
            cand = cand.filter(frontier_gate)
    # in-batch first-wins dedup by deterministic enqueue order
    first_w = Window.partitionBy("canon_url").orderBy(
        "parent_host", "parent_rank", "pos"
    )
    cand = cand.withColumn("_rn", F.row_number().over(first_w)).filter(
        F.col("_rn") == 1
    )
    # per-(host) local enqueue position
    local_w = Window.partitionBy("host").orderBy("parent_host", "parent_rank", "pos")
    next_wave = wave + 1
    # BFS-with-preference hook: priority_expr scores DISCOVERED links
    # (columns in scope: canon_url, host, data_type, parent_url,
    # child_kind); lower = fetched earlier within a host's budget, the
    # reference mailbox's lower-is-more-important convention
    # (CrawlerBoundedPriorityMailbox.scala:14-21). Seeds and first-touch
    # injections keep priority 0 — the reference's highest message class
    # stays ahead. Default None = lit(0) = pure BFS, byte-identical to
    # the unhooked wave (tests/test_priority.py).
    # priority_table: (host, priority) dim joined broadcast onto the
    # discovered links — the recrawl-scheduler feed (e.g. the
    # crawl_host_rank authority buckets). Host-level lanes matter when
    # waves are resource-capped (max_urls): they decide which hosts win
    # the cap. Resolution order: row-level priority_expr (where
    # non-null) > host lane > 0. The dim must be broadcast-sized
    # (bounded by distinct hosts with a non-default lane) — pre-join
    # onto the frontier yourself if it is not.
    if priority_table is not None:
        cand = cand.join(
            F.broadcast(
                priority_table.select(
                    "host", F.col("priority").alias("_host_prio")
                )
            ),
            "host",
            "left",
        )
        host_prio = F.col("_host_prio").cast("int")
        if priority_expr is None:
            prio = F.coalesce(host_prio, F.lit(0))
        else:
            prio = F.coalesce(priority_expr, host_prio, F.lit(0))
    else:
        prio = F.lit(0) if priority_expr is None else priority_expr
    cand = cand.select(
        "canon_url",
        "host",
        "data_type",
        F.col("parent_url").alias("ref_url"),
        F.lit(next_wave).alias("wave"),
        prio.cast("int").alias("priority"),
        (
            F.lit(GROUP_LINK << _GROUP_SHIFT) + F.row_number().over(local_w)
        ).cast("long").alias("enq_seq"),
    )
    cand = dedup_against_seen(
        cand, seen, bloom=bloom, n_shards=bloom_shards,
        seen_rows_hint=seen_rows_hint,
    )
    cand.cache()  # feeds first-touch detection AND the next-frontier union

    # ---- 8. first-touch injections (root + sitemap seeding) --------------
    injected, new_hosts = inject_first_touch(
        cand, known_hosts, sites, sitemap_bodies or {}, next_wave,
        template=first_touch_template, prune_host_dims=prune_host_dims,
    )
    new_hosts.cache()  # consumed by the injected rows and the hosts sink
    injected = dedup_against_seen(
        injected, seen, bloom=bloom, n_shards=bloom_shards,
        seen_rows_hint=seen_rows_hint,
    )
    # root/sitemap may collide with triggered candidates: triggers win on
    # group order only if url differs — dedup across the union, keeping
    # the smallest (group, local) = enq_seq per url (root < links < sitemap
    # per the simulator's [root]+triggers+[sitemap] enqueue order).
    union_w = Window.partitionBy("canon_url").orderBy("enq_seq")
    new_frontier = (
        cand.unionByName(injected)
        .withColumn("_rn", F.row_number().over(union_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    new_frontier.cache()  # consumed by both the frontier and seen sinks

    pending_next = leftover.unionByName(new_frontier)
    seen_add = new_frontier.select("canon_url")
    hashes_add = extracted.select("content_hash").distinct()
    return WaveOutput(
        results, links, pending_next, seen_add, hashes_add, new_hosts,
        assets, assets_probe,
    )
