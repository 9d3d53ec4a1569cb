"""The BFS crawl driver loop (SURVEY §7 step 6) — deterministic
wave iteration with per-wave atomic checkpointing and resume.

Catalyst has no fixpoint operator; the loop lives on the driver, but ALL
data work is DataFrame ops — the driver only sequences waves and reads
tiny aggregate counts. Each wave:

    state(wave k) --run_wave--> deltas + state(wave k+1) --commit-->

The frontier is rewritten per wave (it genuinely changes) and re-read
from parquet — this both truncates lineage (no ever-growing plan) and IS
the checkpoint. The seen/seen_hashes/known_hosts sets are APPEND-ONLY:
each wave appends only its additions (``seen_add[k]`` = URLs enqueued
into frontier[k]) and readers union the add-deltas — at 10^10-URL scale
rewriting a seen set per wave would dwarf the crawl itself. Deltas
(crawl_results, links, metrics) append per wave. Commit order: deltas
first (including the adds), frontier snapshot last (atomic rename) — a
crash between the two leaves orphan deltas that resume truncates
(DeltaLog.truncate_after; results[k] is cut at snapshot k, adds at k+1
since snapshot k+1 implies adds[k+1]), so the resumed run is
byte-identical to an uninterrupted one (tested in test_resume.py).

The reference's equivalents: BigQueue flush+gc (queue/Queue.scala:10),
Postgres .transactionally commits (CrawlerDIO.scala:54,77,86), and SIGINT
graceful shutdown (CrawlerApp.scala:38-45) — here any kill is graceful
because state is always wave-consistent on disk.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.politeness import host_delays
from ..operators.seen import build_bloom, merge_blooms
from ..sinks.tables import DeltaLog, SnapshotStore
from .wave import (
    build_first_touch_template,
    inject_first_touch,
    run_wave,
    seed_frontier,
)

ADD_TABLES = ("seen_add", "hashes_add", "hosts_add")


@dataclass
class CrawlStats:
    waves: int = 0
    fetched: int = 0
    per_wave: list = field(default_factory=list)


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        sites: DataFrame,
        sitemap_bodies: dict[str, str] | None,
        ckpt_dir: str,
        wave_seconds: int = 60,
        use_bloom: bool = False,
        bloom_shards: int = 8,
        bloom_bits_per_shard: int = 1 << 23,
        seen_filter: str = "bloom",
        cuckoo_buckets_per_shard: int = 1 << 18,
        broadcast_fetch: bool = False,
        politeness_salt_shards: int = 16,
        compact_every: int = 8,
        priority_expr=None,
        priority_table: DataFrame | None = None,
        max_urls_per_wave: int | None = None,
        host_dim_broadcast_limit: int = 1_000_000,
        fetcher=None,
        frontier_gate=None,
    ):
        self.spark = spark
        self.pages = pages
        self.sites = sites
        self.bodies = sitemap_bodies or {}
        self.store = SnapshotStore(f"{ckpt_dir}/state")
        self.deltas = DeltaLog(f"{ckpt_dir}/deltas")
        self.wave_seconds = wave_seconds
        self.use_bloom = use_bloom
        self.bloom_shards = bloom_shards
        # fixed per-shard bitmap size makes per-wave filters OR-mergeable:
        # wave cost is O(new urls), not O(seen). Default 2^23 bits = 1 MB
        # per shard ≈ 800k keys at 10 bits/key; at 10^10 keys size shards
        # so n_shards * capacity covers the frontier (overfill only
        # degrades the FP rate, i.e. costs exact probes, never drops URLs)
        self.bloom_bits_per_shard = bloom_bits_per_shard
        # seen_filter picks the routing-filter family when use_bloom=True:
        # "bloom" (operators.seen) or "cuckoo" (operators.cuckoo — ~half
        # the space at equal fpp, supports deletion); both share the
        # sharded/cogrouped probe contract and the incremental per-wave
        # merge, and both are proven byte-identical to exact-only dedup
        # (tests/test_bloom.py, tests/test_cuckoo.py)
        if seen_filter not in ("bloom", "cuckoo"):
            raise ValueError("seen_filter must be 'bloom' or 'cuckoo'")
        if cuckoo_buckets_per_shard <= 0 or (
            cuckoo_buckets_per_shard & (cuckoo_buckets_per_shard - 1)
        ):
            # fail at construction, not mid-crawl inside an executor task
            raise ValueError("cuckoo_buckets_per_shard must be a power of two")
        self.seen_filter = seen_filter
        self.cuckoo_buckets_per_shard = cuckoo_buckets_per_shard
        self._bloom: DataFrame | None = None
        # fetch strategy: the default shuffled join relies on the corpus
        # being bucketed by url (Iceberg bucket transform / parquet
        # bucketBy) so only the batch side shuffles; broadcast_fetch=True
        # instead streams an unbucketed corpus against a broadcast of the
        # wave batch — use it when the corpus layout can't be chosen and
        # wave batches stay broadcast-sized.
        self.broadcast_fetch = broadcast_fetch
        self.politeness_salt_shards = politeness_salt_shards
        # BFS-with-preference: optional Column scoring discovered links
        # (lower fetches earlier within a host budget); None = pure BFS
        self.priority_expr = priority_expr
        # (host, priority) dim for host-level lanes (recrawl scheduling:
        # feed crawl_host_rank-style authority buckets here) and global
        # wave cap — at a 10^10 frontier a wave must be resource-bounded;
        # the cap keeps the globally most-important rows of the budgeted
        # sets and returns the rest to pending (operators.politeness).
        # Both default off = byte-identical to the reference ordering.
        self.priority_table = priority_table
        self.max_urls_per_wave = max_urls_per_wave
        # pluggable fetch stage (sources.fetcher): None = corpus join;
        # a production deployment injects http_fetcher(fetch_fn) here
        self.fetcher = fetcher
        # discovery-time URL curation gate (boolean Column over
        # canon_url/host/data_type, or a df->df transform for
        # join-shaped blocklists) — see plans/wave.py and
        # functions/urlfilter.py; None = every discovered link enqueues
        self.frontier_gate = frontier_gate
        # fold the append-only add-deltas every k waves so the per-wave
        # seen scan reads O(1) directories instead of O(waves) (VERDICT r1
        # residual: file-count growth linear in waves); 0 disables
        self.compact_every = compact_every
        # static per-crawl dims: robots delays + first-touch (root/sitemap)
        # rows. Materialized to parquet ONCE so the sitemap-parse and
        # canonicalize UDFs never re-run per wave and the per-wave plans
        # start from a plain (broadcastable) scan with no UDF lineage.
        dims_dir = f"{ckpt_dir}/dims"
        host_delays(sites).write.mode("overwrite").parquet(f"{dims_dir}/delays")
        build_first_touch_template(sites, sitemap_bodies).write.mode(
            "overwrite"
        ).parquet(f"{dims_dir}/first_touch")
        self.delays = spark.read.parquet(f"{dims_dir}/delays")
        self.first_touch = spark.read.parquet(f"{dims_dir}/first_touch")
        self._dims_dir = dims_dir
        self.seed_hosts: DataFrame | None = None  # set at init / resume
        # huge-dim mode: the sites-derived dims (robots bodies, delays,
        # first-touch template) scale with TOTAL known hosts, not wave
        # size — past the limit a full-dim broadcast is multi-GB per
        # executor (the round-1 broadcast-all-Bloom-shards bug class), so
        # the wave switches to left_semi-pruned / shuffle joins. Decided
        # ONCE per crawl from the materialized delay dim's row count (a
        # parquet metadata read, no scan). limit<=0 forces pruning on —
        # the equivalence-test hook.
        self.prune_host_dims = (
            host_dim_broadcast_limit <= 0
            or self.delays.count() > host_dim_broadcast_limit
        )

    # ------------------------------------------------------------------ init
    def _init_state(self, seeds: list[str] | DataFrame) -> tuple[int, int]:
        spark = self.spark
        # fresh start over a reused checkpoint dir: clear EVERY delta table
        # first — the append-only refactor means read_all unions all wave
        # directories, so stale seen_add/hashes_add deltas from a previous
        # crawl would silently dedup (= never crawl) this run's URLs —
        # AND the snapshot store, whose higher-numbered stale snapshots
        # would otherwise win latest_wave() on a later resume
        self.deltas.truncate_after(-1)
        self.store.clear()
        triggers = seed_frontier(spark, seeds)
        # the raw seed list itself is checkpoint state (ADVICE r3): a
        # resumed graph report derives its TrustRank trust set from the
        # seeds, and recomputing them from whatever --seeds the resume
        # invocation happens to pass could silently shift the trust set
        if isinstance(seeds, DataFrame):
            url_col = "url" if "url" in seeds.columns else seeds.columns[0]
            raw_seeds = seeds.select(
                F.col(url_col).cast("string").alias("url")
            )
        else:
            raw_seeds = spark.createDataFrame(
                [(str(u),) for u in seeds], "url string"
            )
        raw_seeds.write.mode("overwrite").parquet(
            f"{self._dims_dir}/seed_urls"
        )
        # seed-host dim (asset download flag, DomainWorkerActor download
        # semantics): persisted so resume sees the same gate
        triggers.select("host").distinct().write.mode("overwrite").parquet(
            f"{self._dims_dir}/seed_hosts"
        )
        self.seed_hosts = spark.read.parquet(f"{self._dims_dir}/seed_hosts")
        injected, new_hosts = inject_first_touch(
            triggers, _empty_hosts(spark), self.sites, self.bodies, next_wave=0,
            template=self.first_touch, prune_host_dims=self.prune_host_dims,
        )
        from pyspark.sql import Window

        w = Window.partitionBy("canon_url").orderBy("enq_seq")
        pending = (
            triggers.unionByName(injected)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        pending.cache()  # consumed by the seen_add delta and the snapshot
        # adds first, snapshot last (same crash-consistency order as waves)
        self.deltas.append(0, "seen_add", pending.select("canon_url"))
        self.deltas.append(
            0, "hashes_add", spark.createDataFrame([], "content_hash string")
        )
        self.deltas.append(0, "hosts_add", new_hosts)
        manifest = self.store.commit_wave(0, {"frontier": pending})
        return 0, _lineage_rows(manifest, "frontier")

    # ------------------------------------------------------------------- run
    def run(
        self,
        seeds: list[str] | DataFrame | None = None,
        max_waves: int | None = None,
        max_results: int | None = None,
        resume: bool = False,
    ) -> CrawlStats:
        spark = self.spark
        # the incremental bloom tracks THIS run's seen set — a second
        # run() on the same Crawler (fresh or resume) must rebuild it
        self._bloom = None
        # frontier size comes from the commit manifest's lineage row counts
        # (written at snapshot time) — no extra isEmpty()/count() job per
        # wave; it also drives the small-wave gearbox below
        if resume:
            wave = self.store.latest_wave()
            if wave is None:
                raise ValueError("nothing to resume from")
            # crash-recover interrupted compactions BEFORE any delta read:
            # a compact dir may still coexist with the sources it replaced
            self.deltas.finish_compactions(ADD_TABLES)
            # results[k]/links[k]/metrics[k] are written during wave k —
            # valid only if snapshot k+1 landed; adds[k] belong to
            # snapshot k. Different cutoffs, same invariant.
            self.deltas.truncate_after(
                wave - 1, tables=("crawl_results", "links", "metrics", "assets")
            )
            self.deltas.truncate_after(wave, tables=ADD_TABLES)
            import os

            if os.path.isdir(f"{self._dims_dir}/seed_hosts"):
                self.seed_hosts = spark.read.parquet(
                    f"{self._dims_dir}/seed_hosts"
                )
            try:
                frontier_rows = _lineage_rows(self.store.manifest(wave), "frontier")
            except (FileNotFoundError, KeyError):
                frontier_rows = None
        else:
            assert seeds is not None, "seeds required for a fresh crawl"
            wave, frontier_rows = self._init_state(seeds)

        stats = CrawlStats()
        fetched_total = _count_fetched(self.deltas, spark)
        # adaptive-execution gearbox: AQE + wide shuffles are essential at
        # corpus scale (skew-join splitting, runtime coalesce) but at small
        # wave sizes each AQE stage re-plan adds ~1s of fixed latency — a
        # 3x wall-clock tax measured at sf0.001. Switch per wave on the
        # current frontier size (known from the snapshot manifest's lineage
        # counts); both confs are runtime-settable.
        base_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        base_parts = spark.conf.get("spark.sql.shuffle.partitions", "32")
        try:
            while True:
                if max_waves is not None and wave >= max_waves:
                    break
                if max_results is not None and fetched_total >= max_results:
                    break
                if frontier_rows == 0:
                    break
                state = {
                    "frontier": self.store.read(spark, wave, "frontier"),
                    # append-only sets: one recursive scan over the add-deltas
                    "seen": self.deltas.read_all(spark, "seen_add"),
                    "seen_hashes": self.deltas.read_all(spark, "hashes_add"),
                    "known_hosts": self.deltas.read_all(spark, "hosts_add"),
                }
                if frontier_rows is None and state["frontier"].isEmpty():
                    break
                small = frontier_rows is not None and frontier_rows < 20_000
                spark.conf.set(
                    "spark.sql.adaptive.enabled", "false" if small else base_aqe
                )
                spark.conf.set(
                    "spark.sql.shuffle.partitions", "8" if small else base_parts
                )
                t0 = time.time()
                bloom = None
                if self.use_bloom:
                    if self._bloom is None:
                        # one full build per run/resume; afterwards the filter
                        # is maintained incrementally (merge of each wave's
                        # adds) — rebuilding from the whole seen set per wave
                        # would make bloom maintenance quadratic over a crawl
                        self._bloom = self._build_filter(
                            state["seen"]
                        ).localCheckpoint(eager=True)
                    bloom = self._bloom
                out = run_wave(
                    spark,
                    wave,
                    state["frontier"],
                    self.pages,
                    self.sites,
                    state["seen"],
                    state["seen_hashes"],
                    state["known_hosts"],
                    self.bodies,
                    self.wave_seconds,
                    bloom=bloom,
                    bloom_shards=self.bloom_shards if self.use_bloom else None,
                    delays=self.delays,
                    first_touch_template=self.first_touch,
                    broadcast_fetch=self.broadcast_fetch
                    and (frontier_rows is None or frontier_rows <= 5_000_000),
                    # skew-proof two-phase politeness top-k only pays off once
                    # a hot host could dominate a single sort task
                    politeness_salt_shards=(
                        0 if small else self.politeness_salt_shards
                    ),
                    seed_hosts=self.seed_hosts,
                    # seen ≈ everything ever enqueued = fetched + still
                    # pending — close enough for the 20x broadcast heuristic
                    seen_rows_hint=(
                        fetched_total + (frontier_rows or 0)
                        if self.use_bloom
                        else None
                    ),
                    priority_expr=self.priority_expr,
                    priority_table=self.priority_table,
                    max_urls=self.max_urls_per_wave,
                    prune_host_dims=self.prune_host_dims,
                    fetcher=self.fetcher,
                    frontier_gate=self.frontier_gate,
                )
                # deltas first; wave metrics ride the results write as observed
                # aggregates — no extra job.
                from pyspark.sql import Observation

                obs = Observation(f"wave_{wave}_metrics")
                results_obs = out.results.observe(
                    obs,
                    F.count(F.lit(1)).alias("fetched"),
                    F.count(F.when(F.col("page_type") == "HTML", 1)).alias("html_pages"),
                    F.count(F.when(F.col("page_type") == "INVALID", 1)).alias("invalid"),
                    F.count(F.when(F.col("page_type") == "DISALLOWED", 1)).alias("disallowed"),
                    F.count(F.when(F.col("page_type") == "DUPLICATE", 1)).alias("duplicates"),
                    F.count(F.when(F.col("page_type") == "BINARY", 1)).alias("binary"),
                    F.approx_count_distinct("host").alias("hosts"),
                )
                # Write ordering = cache-dependency order (concurrent writes
                # measured slower — interleaved jobs trash cache locality):
                # results materializes the staged cache; links + hashes_add
                # read it; seen_add materializes the cand/new_frontier caches;
                # hosts_add + the frontier snapshot read only materialized
                # caches. Adds always land before the frontier snapshot (the
                # commit point) for crash consistency; each wave appends ONLY
                # its additions.
                self.deltas.append(wave, "crawl_results", results_obs)
                # obs completes with the results write; gating the assets
                # delta on the observed BINARY count skips a whole re-join
                # against the corpus on waves that fetched no binary content
                # (the asset branch reads the uncached html-bearing frame)
                mvals = obs.get
                self.deltas.append(wave, "links", out.links)
                # two-stage gate: the free observed global-binary count,
                # then (binary waves only) an html-free probe of the cached
                # staged frame for SEED-host binaries — the assets write
                # re-runs the corpus fetch join, which must not be paid to
                # discover all of a wave's binaries were off-seed
                if (
                    out.assets is not None
                    and mvals["binary"] > 0
                    and out.assets_probe is not None
                    and not out.assets_probe.isEmpty()
                ):
                    self.deltas.append(wave, "assets", out.assets)
                t_deltas = time.time()
                self.deltas.append(wave + 1, "seen_add", out.seen_add)
                self.deltas.append(wave + 1, "hashes_add", out.hashes_add)
                self.deltas.append(wave + 1, "hosts_add", out.hosts_add)
                manifest = self.store.commit_wave(
                    wave + 1, {"frontier": out.pending_next}
                )
                frontier_rows = _lineage_rows(manifest, "frontier")
                if self.use_bloom:
                    # fold this wave's additions into the filter (seen_add was
                    # just materialized by its delta write, so the build scans
                    # only new urls); eager checkpoint truncates lineage and
                    # survives the per-wave clearCache
                    self._bloom = self._merge_filters(
                        self._bloom, self._build_filter(out.seen_add)
                    ).localCheckpoint(eager=True)
                n_fetched = mvals["fetched"]
                fetched_total += n_fetched
                metrics = {
                    "wave": wave,
                    "hosts": mvals["hosts"],
                    "fetched": n_fetched,
                    "html_pages": mvals["html_pages"],
                    "invalid": mvals["invalid"],
                    "disallowed": mvals["disallowed"],
                    "duplicates": mvals["duplicates"],
                    "binary": mvals["binary"],
                    "elapsed_sec": round(time.time() - t0, 3),
                    "deltas_sec": round(t_deltas - t0, 3),
                    "snapshot_sec": round(time.time() - t_deltas, 3),
                }
                # one tiny row — written driver-side (pyarrow), no Spark job
                self.deltas.append_local(wave, "metrics", [metrics])
                # compaction only covers committed adds: snapshot wave+1 just
                # landed, so adds <= wave+1 are final and safe to fold
                if self.compact_every and (wave + 1) % self.compact_every == 0:
                    for t in ADD_TABLES:
                        self.deltas.compact(spark, t, upto_wave=wave + 1)
                stats.per_wave.append(metrics)
                stats.waves += 1
                stats.fetched = fetched_total
                spark.catalog.clearCache()
                wave += 1
        finally:
            # restore even when a wave raises: the small-wave gear
            # (AQE off, 8 partitions) must never leak into the
            # session — a retried run() would re-capture the
            # degraded values as its baseline and "restore" them
            spark.conf.set("spark.sql.adaptive.enabled", base_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        return stats

    # ------------------------------------------------------- filter strategy
    def _build_filter(self, urls: DataFrame) -> DataFrame:
        if self.seen_filter == "cuckoo":
            from ..operators.cuckoo import build_cuckoo

            return build_cuckoo(
                urls, self.bloom_shards, n_buckets=self.cuckoo_buckets_per_shard
            )
        return build_bloom(
            urls, self.bloom_shards, n_bits=self.bloom_bits_per_shard
        )

    def _merge_filters(self, a: DataFrame, b: DataFrame) -> DataFrame:
        if self.seen_filter == "cuckoo":
            from ..operators.cuckoo import merge_cuckoos

            return merge_cuckoos(a, b)
        return merge_blooms(a, b)

    # --------------------------------------------------------------- readers
    def seed_urls(self) -> DataFrame | None:
        """The seed list this checkpoint was initialized with (url
        rows), persisted by _init_state; None for checkpoints written
        before the seed list became state. Resume-safe source of truth
        for seed-derived artifacts (TrustRank trust sets)."""
        import os

        p = f"{self._dims_dir}/seed_urls"
        return self.spark.read.parquet(p) if os.path.isdir(p) else None

    def results(self) -> DataFrame | None:
        return self.deltas.read_all(self.spark, "crawl_results")

    def links(self) -> DataFrame | None:
        df = self.deltas.read_all(self.spark, "links")
        # global edge dedup on read (Iceberg MERGE equivalent)
        return df.dropDuplicates(["from_url", "to_url"]) if df is not None else None

    def metrics(self) -> DataFrame | None:
        return self.deltas.read_all(self.spark, "metrics")

    def assets(self) -> DataFrame | None:
        return self.deltas.read_all(self.spark, "assets")

    def seen(self) -> DataFrame:
        return self.deltas.read_all(self.spark, "seen_add")


def _empty_hosts(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "host string")


def _count_fetched(deltas: DeltaLog, spark: SparkSession) -> int:
    df = deltas.read_all(spark, "crawl_results")
    return 0 if df is None else df.count()


def _lineage_rows(manifest: dict, table: str) -> int:
    return sum(e["rows"] for e in manifest["lineage"][table])
