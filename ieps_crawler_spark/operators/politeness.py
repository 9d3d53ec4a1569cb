"""Politeness budget selection — the Spark re-expression of the
reference's per-domain FIFO + crawl-delay loop (DomainWorkerActor.scala:
102-151 politeness scheduling; SiteRobotsTxt.scala:18-30 delays;
FrontierManagerActor.scala:77-100 domain routing).

The reference gives each domain one worker that sleeps ``delay`` ms
between fetches — i.e. a host fetches at most ``wave_ms / delay_ms`` URLs
per wall-clock window. We make the window explicit (a crawl wave) and
enforce the budget with a rank-over-window: FIFO order within a host is
``(priority, wave, enq_seq)`` (BFS-with-preference; priority ascending
like the reference's priority mailbox, CrawlerBoundedPriorityMailbox.
scala:14-21), and only the first ``budget(host)`` rows are fetched; the
rest stay pending.

Scale notes (100 TB / 10^10-frontier):
- The window shuffles by host — exactly the politeness isolation the
  reference gets from 1-worker-per-domain (no host spans a politeness
  group). Skewed giant hosts are bounded by the budget itself: rank is
  computed per host partition and AQE skew handling splits oversized
  partitions for the join stages that follow.
- ``sched_ts = wave_start + (rank-1) * delay_ms`` reproduces the crawl
  clock without wall-clock sleeps (test-scale determinism; a production
  fetcher would rate-limit on this column).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.robots import DEFAULT_CRAWL_DELAY_MS

WAVE_EPOCH = dt.datetime(2019, 4, 1, 0, 0, 0)


def host_delays(sites_df: DataFrame) -> DataFrame:
    """(host, delay_ms) from robots content — tiny dim, broadcast at use."""
    from ..functions.robots import robots_delay_udf

    return sites_df.select(
        "host", robots_delay_udf("robots_content").alias("delay_ms")
    )


def select_budget(
    frontier: DataFrame,
    delays: DataFrame,
    wave: int,
    wave_seconds: int = 60,
    salt_shards: int = 0,
    max_urls: int | None = None,
    broadcast_delays: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns (batch, leftover). batch carries fetch_order (per-host rank),
    delay_ms and sched_ts; leftover is the untouched pending remainder.

    ``max_urls`` bounds the WAVE globally (resource-bounded scheduling):
    at a 10^10-URL frontier the union of all ready hosts' budgets can
    exceed what one wave should materialize (fetch-join broadcast size,
    extraction memory, snapshot write), so the scheduler keeps only the
    globally most-important ``max_urls`` rows of the budgeted sets —
    ordered by (priority, wave, enq_seq, host), a deterministic total
    order since (host, enq_seq) is unique — and returns the rest to
    pending untouched. This is where host-level priorities (see
    ``Crawler(priority_table=...)``) become load-bearing: they decide
    which hosts win when waves are resource-capped, while within a host
    the FIFO/priority contract is unchanged. Selection is a global top-K
    (sort-free TakeOrdered merge), never a single-partition sort; the
    only extra cost is one anti-join to route the displaced rows back to
    leftover. None (default) = unbounded waves, byte-identical behavior.

    ``salt_shards`` > 1 enables the skew-proof two-phase top-k for
    heavy-tailed hosts (north_rule: explicit skew handling): phase 1
    ranks within (host, salt = xxhash64(url) % shards) shards and keeps
    each shard's top-``budget`` — a guaranteed superset of the true
    per-host top-``budget`` (any row FIFO-ahead of a kept row has shard
    rank ≤ its global rank, so it is kept in its own shard too). Phase 2
    exact-ranks only the ≤ budget×shards survivors per host, so no
    single task ever sorts a hot host's full pending frontier. Batch
    rows get byte-identical fetch_order/sched_ts to the single-phase
    form; phase-1 castoffs flow to leftover untouched.

    ``broadcast_delays=False`` drops the broadcast hint on the delay dim —
    the scale-safe mode when the dim is one row per DISCOVERED host
    (10^7-10^8 at a 10^10-URL frontier, multi-GB per executor as a
    broadcast). The plain join shuffles both sides by host, and the
    politeness window immediately reuses that clustering, so the only
    extra cost vs broadcast is the dim's own shuffle (bucketing both
    sides by host in storage removes even that on a real cluster)."""
    wave_ms = wave_seconds * 1000
    w = Window.partitionBy("host").orderBy("priority", "wave", "enq_seq")
    delays_side = F.broadcast(delays) if broadcast_delays else delays
    sized = (
        frontier.join(delays_side, "host", "left")
        .withColumn(
            "delay_ms", F.coalesce(F.col("delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS))
        )
        .withColumn("budget", F.greatest(F.lit(1), F.lit(wave_ms) / F.col("delay_ms")).cast("long"))
    )
    pruned_out = None
    if salt_shards > 1:
        w1 = Window.partitionBy("host", "_salt").orderBy(
            "priority", "wave", "enq_seq"
        )
        sized = (
            sized.withColumn(
                "_salt",
                F.pmod(F.xxhash64("canon_url"), F.lit(salt_shards)).cast("int"),
            )
            .withColumn("_r1", F.row_number().over(w1))
        )
        sized.cache()  # split into survivors + castoffs without recompute
        pruned_out = sized.filter(F.col("_r1") > F.col("budget")).select(
            *frontier.columns
        )
        sized = sized.filter(F.col("_r1") <= F.col("budget")).drop("_salt", "_r1")
    ranked = sized.withColumn("fetch_order", F.row_number().over(w).cast("long"))
    # batch and leftover split the same ranked frame — cache so the
    # join+window runs once, not once per consumer
    ranked.cache()
    within = ranked.filter(F.col("fetch_order") <= F.col("budget"))
    capped_out = None
    if max_urls is not None:
        kept = within.orderBy("priority", "wave", "enq_seq", "host").limit(
            max_urls
        )
        # per-host ranks compress so the crawl clock (sched_ts below)
        # stays contiguous: a host that lost rows to the cap still
        # fetches its survivors delay_ms apart from the wave start
        kept = kept.withColumn(
            "fetch_order", F.row_number().over(w).cast("long")
        )
        kept.cache()
        # identity key is (host, wave, enq_seq): enq_seq is only unique
        # per (host, wave) — an enq_seq collision across waves would
        # otherwise silently drop the other wave's row from pending
        capped_out = within.join(
            kept.select("host", "wave", "enq_seq"),
            ["host", "wave", "enq_seq"],
            "left_anti",
        ).select(*frontier.columns)
        within = kept
    wave_start = F.lit(WAVE_EPOCH) + F.make_interval(secs=F.lit(wave * wave_seconds))
    batch = within.withColumn(
        "sched_ts",
        (
            F.col("fetch_order") - F.lit(1)
        ).cast("double") * F.col("delay_ms") / 1000.0
        # seconds offset → timestamp
    ).withColumn(
        "sched_ts", wave_start + F.make_interval(secs=F.col("sched_ts"))
    )
    leftover = ranked.filter(F.col("fetch_order") > F.col("budget")).select(
        *frontier.columns
    )
    if capped_out is not None:
        leftover = leftover.unionByName(capped_out)
    if pruned_out is not None:
        leftover = leftover.unionByName(pruned_out)
    return batch.drop("budget"), leftover


def refresh_schedule(
    pages: DataFrame,
    delays: DataFrame,
    as_of,
    min_age_seconds: int,
    wave_seconds: int = 60,
) -> DataFrame:
    """Staleness-driven re-crawl scheduling: pick, per host, the pages
    whose last capture (``warc_ts``) is at least ``min_age_seconds`` old
    at ``as_of``, oldest-first, within the same politeness budget a
    discovery wave gets (wave_ms / crawl-delay(host), min 1). The
    reference crawls each URL exactly once (UNIQUE(page.url),
    crawldb.sql:33); a continuously-operated corpus needs the follow-up
    policy — which URLs to RE-fetch, and when — and it must obey the
    identical robots/politeness contract as discovery.

    Returns (url, host, warc_ts, age_s, fetch_order, sched_ts): one row
    per selected page, ``fetch_order`` the per-host rank (1 = stalest)
    and ``sched_ts`` the politeness-spaced fetch time from ``as_of``.
    Deterministic: ordering key (warc_ts, url) is a total order per host.

    Scale posture: the staleness filter pushes down to the corpus scan
    (warc_ts is a plain column predicate — on a warc_ts-partitioned
    Iceberg table this prunes whole partitions, so a 10^10-page corpus
    scans only its stale slice); one broadcast join against the tiny
    delay dim; one window shuffle on host — the same shape, and the same
    skew bound (budget truncates every host), as select_budget.
    """
    wave_ms = wave_seconds * 1000
    as_of_col = F.lit(as_of).cast("timestamp")
    age_s = (as_of_col.cast("double") - F.col("warc_ts").cast("double"))
    stale = pages.filter(age_s >= F.lit(float(min_age_seconds)))
    w = Window.partitionBy("host").orderBy("warc_ts", "url")
    sized = (
        stale.join(F.broadcast(delays), "host", "left")
        .withColumn(
            "delay_ms", F.coalesce(F.col("delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS))
        )
        .withColumn(
            "budget",
            F.greatest(F.lit(1), F.lit(wave_ms) / F.col("delay_ms")).cast("long"),
        )
        .withColumn("fetch_order", F.row_number().over(w).cast("long"))
    )
    return (
        sized.filter(F.col("fetch_order") <= F.col("budget"))
        .withColumn("age_s", age_s.cast("long"))
        .withColumn(
            "sched_ts",
            as_of_col
            + F.make_interval(
                secs=(F.col("fetch_order") - 1).cast("double")
                * F.col("delay_ms")
                / 1000.0
            ),
        )
        .select("url", "host", "warc_ts", "age_s", "fetch_order", "sched_ts")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Re-crawl change detection: diff two crawl snapshots of the same
    URL space by content hash. Returns one row per URL in EITHER
    snapshot: (key_col, old_hash, new_hash, change) with change ∈
    {'added', 'gone', 'changed', 'unchanged'} — the signal a
    continuously-operated corpus feeds back into refresh_schedule
    (changed URLs argue for shorter revisit intervals, 'gone' for
    pruning) and into trap detection ('added' floods). The reference
    fetches each URL exactly once (UNIQUE(page.url), crawldb.sql:33)
    and never re-visits; this is the between-visits layer a continuous
    crawl adds.

    NULL hashes (fetch failed, binary skipped) compare as distinct from
    every real hash but equal to each other — a page that failed both
    times is 'unchanged', failed→fetched is 'changed'.

    Scale posture: ONE full-outer shuffle join on the URL key and a
    codegen projection — no windows, no Python; both sides prune to
    (key, hash) at the scan. On url-bucketed Iceberg snapshots the
    shuffle disappears entirely (storage-partitioned join), the same
    layout the wave fetch join already relies on.
    """
    o = old.select(
        F.col(key_col).alias("_k"), F.col(hash_col).alias("old_hash")
    )
    n = new.select(
        F.col(key_col).alias("_k2"),
        F.col(hash_col).alias("new_hash"),
    )
    j = o.join(n, o["_k"] == n["_k2"], "full_outer")
    present_old = o["_k"].isNotNull()
    present_new = n["_k2"].isNotNull()
    return j.select(
        F.coalesce(o["_k"], n["_k2"]).alias(key_col),
        "old_hash",
        "new_hash",
        F.when(~present_old, F.lit("added"))
        .when(~present_new, F.lit("gone"))
        .when(
            F.col("old_hash").eqNullSafe(F.col("new_hash")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
        .alias("change"),
    )


def adaptive_delays(
    fetches: DataFrame,
    host_col: str = "host",
    load_col: str = "load_time_ms",
    p: float = 0.95,
    mult: int = 3,
    min_ms: int = 500,
    max_ms: int = 10_000,
    default_ms: int = 4_000,
) -> DataFrame:
    """Feedback politeness: per-host crawl delay derived from MEASURED
    server latency — delay_ms = clamp(min, max, mult × p95(load_time)).
    A slow host (p95 500 ms) gets mult× headroom between hits; a fast
    CDN host drops to the floor. The reference fixes 4 s for every host
    (DomainWorkerActor.scala:129 via Crawl-delay default) — this is the
    auto-tuning layer real crawlers put on top, and hosts with no
    observations keep ``default_ms`` (the reference's constant).

    All-integer output (exact p-quantile via stats.disc_quantiles —
    histogram + one window over distinct values — then integer
    multiply/clamp): hash-stable across engines, and mergeable into
    host_delays() as an override column.

    Scale posture: the quantile aggregates a (host, load_ms) histogram
    (map-side combine collapses repeated latencies per task), the
    window sorts each host's DISTINCT latencies, and the clamp is a
    narrow map — no per-fetch window, no join until the caller merges.
    """
    from .stats import disc_quantiles, quantile_col_name

    q = disc_quantiles(
        fetches.select(host_col, load_col), [host_col], load_col, ps=(p,)
    )
    pcol = quantile_col_name(p)
    return q.select(
        host_col,
        F.col(pcol).cast("long").alias("load_p_ms"),
        F.least(
            F.lit(max_ms).cast("long"),
            F.greatest(
                F.lit(min_ms).cast("long"),
                F.col(pcol).cast("long") * mult,
            ),
        ).alias("delay_ms"),
    )


def detect_traps(
    fetches: DataFrame,
    host_col: str = "host",
    hash_col: str = "content_hash",
    min_urls: int = 20,
    dup_permille: int = 500,
    url_col: str | None = None,
) -> DataFrame:
    """Crawler-trap detection: flag hosts whose URL space keeps growing
    while their CONTENT does not — calendar pages, session-id URLs,
    faceted-search explosions. Signal: per host, distinct content
    hashes vs fetched URLs; a host with ≥ min_urls fetches and a
    duplicate ratio ≥ dup_permille/1000 gets ``is_trap`` and should have
    its politeness budget cut (feed the flag into select_budget's
    priority or drop the host from the frontier).

    The reference marks individual DUPLICATE pages (CrawlerDIO.scala:
    73-86) but keeps crawling the host; this is the host-level feedback
    loop on top. All-integer output (dup ratio in exact permille).

    Subdomain traps (one registered domain fabricating thousands of
    hosts) evade any per-host signal: pre-derive the key with
    functions.domains.registrable_domain and pass it as ``host_col`` to
    aggregate at the pay-level-domain instead.

    ``url_col``: when the input mixes first fetches with staleness
    RE-crawls of the same URL (refresh_schedule output), row counts
    overcount the URL space — a legitimately re-fetched host repeats
    content hashes and would be falsely flagged. Pass the URL column to
    count DISTINCT URLs instead; leave None only when every input row
    is a first fetch.

    Scale posture: one hash aggregate per host with a count_distinct
    expand on the hash (and on the url when given) — all map-side
    combinable; no window, no join.
    """
    n_urls_expr = (
        F.count(F.lit(1))
        if url_col is None
        else F.count_distinct(F.col(url_col))
    )
    agg = fetches.groupBy(host_col).agg(
        n_urls_expr.alias("n_urls"),
        F.count_distinct(F.col(hash_col)).alias("n_distinct"),
    )
    dup_pm = F.expr("((n_urls - n_distinct) * 1000) div n_urls")
    return agg.select(
        host_col,
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        dup_pm.cast("long").alias("dup_permille"),
        (
            (F.col("n_urls") >= min_urls) & (dup_pm >= dup_permille)
        ).alias("is_trap"),
    )
