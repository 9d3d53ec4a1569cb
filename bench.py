#!/usr/bin/env python
"""Benchmark harness for the PySpark crawl engine (driver contract).

Prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {<name>: sec, ...}, "sf": <sf>, ...extras}

Headline = the full BFS crawl (frontier -> politeness -> robots -> corpus
fetch-join -> Arrow-UDF extract -> URL/content dedup -> checkpoint) over a
Common-Crawl-shaped corpus derived from the sf documents table, replicated
to bench scale (default ~200k pages at sf0.1, 64 hosts). The corpus is
materialized to parquet ONCE (untimed setup — it stands in for the Iceberg
pages table); the timed section is the crawl itself, i.e. what the
BASELINE.json metric measures: URLs fetched+deduped/sec.

Every other `__spark_entry__.queries()` entry is timed with a noop-sink
write (full plan execution, no driver collect).

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_REPLICATE / BENCH_HOSTS /
BENCH_SEEDS / BENCH_WAVES. CLI flags override env.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def _time_noop(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


# Queries at or above this first-run cost are re-timed to a median of
# BENCH_MEDIAN_REPS runs (VERDICT r4 #3: iterative graph queries swing
# +-40% run-to-run at fixed code — single samples made the 2.5x
# regression gate fire on JVM weather). Cheap queries stay single-run:
# their absolute noise is too small to trip the canary-normalized gate.
MEDIAN_THRESHOLD_S = 3.0


def _time_query(spark, fn, sf_dir: str, reps: int,
                raw: dict | None = None, name: str = "") -> float:
    t1 = _time_noop(spark, fn, sf_dir)
    if reps < 2 or t1 < MEDIAN_THRESHOLD_S:
        return t1
    times = [t1] + [_time_noop(spark, fn, sf_dir) for _ in range(reps - 1)]
    if raw is not None:
        raw[name] = times
    return sorted(times)[len(times) // 2]


_CORPUS_MEMO: dict = {}

# The driver stores only the last 2000 chars of bench stdout (measured
# from BENCH_r02.json, where one giant final line lost the round's
# official perf record to tail truncation) — the final summary line must
# always fit under this.
FINAL_LINE_BUDGET = 1900


def final_line(results: dict, extras: dict, sf: float, cpus: int) -> dict:
    """Byte-budgeted summary for the LAST stdout line: headline crawl
    config stays whole (minus per-wave arrays), alternate configs
    collapse to one throughput number, and the queries dict keeps the
    slowest entries that fit the remaining bytes (the full set lives in
    BENCH_DETAIL.json and the earlier detail line)."""
    out = {
        # metric/value/unit form the headline triple (the north metric);
        # suite_sec carries the total query-suite seconds separately —
        # r3 fix: value used to hold suite seconds under the throughput
        # metric name, which misreads against BASELINE.md.
        "metric": "urls_fetched_deduped_per_sec",
        "value": extras.get("crawl", {}).get("urls_per_sec", 0.0),
        "unit": "urls/sec",
        "suite_sec": round(sum(results.values()), 3),
        "sf": sf,
        "cpus": cpus,
        "n_queries": len(results),
    }
    if "crawl" in extras:
        out["crawl"] = {k: v for k, v in extras["crawl"].items()
                        if k != "per_wave"}
    for cfg in ("crawl_bloom", "crawl_cuckoo", "crawl_capped",
                "crawl_capped_bloom"):
        if cfg in extras:
            out[f"ups_{cfg.split('_', 1)[1]}"] = extras[cfg]["urls_per_sec"]
    budget = FINAL_LINE_BUDGET - len(json.dumps(out, separators=(",", ":")))
    picked: dict[str, float] = {}
    used = len('"queries":{}') + 1
    for name in sorted(results, key=lambda n: -results[n]):
        cost = len(json.dumps({name: results[name]},
                              separators=(",", ":"))) - 1
        if used + cost > budget:
            break
        picked[name] = results[name]
        used += cost
    out["queries"] = {n: picked[n] for n in results if n in picked}
    return out


def _setup_corpus(spark, sf_dir: str, replicate: int, n_hosts: int,
                  n_seeds: int):
    """Materialize the synthetic web ONCE per bench process as a
    bucketed+sorted table — the parquet stand-in for an Iceberg corpus
    with a bucket(url) partition transform. The per-wave fetch join then
    shuffles ONLY the frontier batch; the corpus html never moves.
    Memoized so the bloom-on rerun reuses the same table + warm JVM."""
    from ieps_crawler_spark.plans.crawl import Crawler
    from ieps_crawler_spark.webgen import web_from_documents

    key = (sf_dir, replicate, n_hosts, n_seeds)
    if key in _CORPUS_MEMO:
        return _CORPUS_MEMO[key]
    pages_expr, sites, seeds = web_from_documents(
        spark, sf_dir, replicate=replicate, n_hosts=n_hosts, n_seeds=n_seeds
    )
    # per-config table name: a second config in the same process must not
    # silently overwrite the table an earlier memo entry still resolves
    # lazily by name
    table = f"bench_corpus_{len(_CORPUS_MEMO)}"
    (
        pages_expr.write.mode("overwrite")
        .bucketBy(64, "url").sortBy("url")
        .saveAsTable(table)
    )
    pages = spark.table(table)
    n_pages = pages.count()
    # untimed warmup, two gears: a tiny 2-wave crawl forks the Arrow
    # workers and JITs the small-wave (AQE-off) paths, then ONE full-size
    # wave with the real seed table JITs the large-wave plan shape the
    # first timed wave will run — AQE re-planning, the salted two-phase
    # politeness top-k and the wide fetch-join codegen are all distinct
    # code paths that the small gearbox never touches, and paying their
    # first-compile inside the timed section skewed wave-0 by up to 2x.
    from ieps_crawler_spark.webgen import seeds_df

    warm_dir = tempfile.mkdtemp(prefix="ieps_warm_")
    try:
        warm = Crawler(spark, pages, sites, None, f"{warm_dir}/warm",
                       wave_seconds=1_000)
        warm.run(seeds=seeds[:2], max_waves=2)
        big = Crawler(spark, pages, sites, None, f"{warm_dir}/big",
                      wave_seconds=1_000_000)
        big.run(seeds=seeds_df(spark, n_pages, n_hosts, n_seeds), max_waves=1)
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)
    _CORPUS_MEMO[key] = (pages, sites, n_pages)
    return _CORPUS_MEMO[key]


def bench_crawl(spark, sf_dir: str, replicate: int, n_hosts: int,
                n_seeds: int, max_waves: int, use_bloom: bool = False,
                bloom_shards: int = 16, seen_filter: str = "bloom",
                max_urls_per_wave: int | None = None) -> dict:
    from ieps_crawler_spark.plans.crawl import Crawler
    from ieps_crawler_spark.webgen import seeds_df

    pages, sites, n_pages = _setup_corpus(
        spark, sf_dir, replicate, n_hosts, n_seeds
    )
    work = tempfile.mkdtemp(prefix="ieps_bench_")
    if use_bloom:
        # per-config warmup: the filter build/probe (bloom bitmap OR /
        # cuckoo fingerprint kernels, cogrouped probe join) are code paths
        # the shared corpus warmup never runs; JIT them on a toy crawl so
        # the timed section measures the filter, not its first compile
        from ieps_crawler_spark.webgen import web_from_documents

        _, _, wseeds = web_from_documents(
            spark, sf_dir, replicate=replicate, n_hosts=n_hosts,
            n_seeds=n_seeds,
        )
        warm = Crawler(
            spark, pages, sites, None, f"{work}/warm", wave_seconds=1_000,
            use_bloom=True, bloom_shards=bloom_shards,
            seen_filter=seen_filter,
        )
        warm.run(seeds=wseeds[:2], max_waves=2)
    try:
        t0 = time.time()
        crawler = Crawler(
            spark, pages, sites, None, f"{work}/ckpt", wave_seconds=1_000_000,
            use_bloom=use_bloom, bloom_shards=bloom_shards,
            seen_filter=seen_filter, max_urls_per_wave=max_urls_per_wave,
        )
        sdf = seeds_df(spark, n_pages, n_hosts, n_seeds)
        stats = crawler.run(seeds=sdf, max_waves=max_waves)
        elapsed = time.time() - t0
        # throughput over wave time: the steady-state crawl rate the
        # BASELINE metric asks for (seed-table init is a one-time cost,
        # reported separately via sec vs wave_sec)
        wave_sec = sum(m["elapsed_sec"] for m in stats.per_wave) or elapsed
        return {
            "sec": round(elapsed, 3),
            "wave_sec": round(wave_sec, 3),
            "urls": stats.fetched,
            "waves": stats.waves,
            "corpus_pages": n_pages,
            "urls_per_sec": round(stats.fetched / wave_sec, 1),
            "per_wave": [
                {
                    "fetched": m["fetched"],
                    "sec": m["elapsed_sec"],
                    "deltas": m.get("deltas_sec"),
                    "snap": m.get("snapshot_sec"),
                }
                for m in stats.per_wave
            ],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=os.environ.get("BENCH_ONLY", ""),
                    help="comma list of query names (or 'crawl') to run")
    ap.add_argument("--replicate", type=int,
                    default=int(os.environ.get("BENCH_REPLICATE", "40")))
    ap.add_argument("--hosts", type=int,
                    default=int(os.environ.get("BENCH_HOSTS", "64")))
    ap.add_argument("--seeds", type=int,
                    default=int(os.environ.get("BENCH_SEEDS", "20000")))
    ap.add_argument("--waves", type=int,
                    default=int(os.environ.get("BENCH_WAVES", "12")))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    except ValueError:  # derived dirs like sf1x / custom names
        sf = 0.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ieps_crawler_spark.session import get_spark

    import __spark_entry__ as entry_mod

    # SPARK_GRAFT_MASTER overrides local[cpus] — e.g. a standalone cluster
    # (spark://...) for real multi-executor N-vs-4N scaling runs; extra
    # per-run conf (executor sizing, cores.max) arrives as JSON in
    # SPARK_GRAFT_CONF
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    extra = {
        "spark.ui.showConsoleProgress": "false",
        # static conf: home for the bucketed bench_corpus table
        "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="ieps_wh_"),
    }
    extra.update(json.loads(os.environ.get("SPARK_GRAFT_CONF", "{}")))
    spark = get_spark("ieps_crawler_bench", master=master, extra_conf=extra)

    only = {s for s in args.only.split(",") if s}
    results: dict[str, float] = {}
    extras: dict = {"cpus": int(cpus), "sf_dir": sf_dir}

    if not only or "crawl" in only:
        crawl = bench_crawl(
            spark, sf_dir, args.replicate, args.hosts, args.seeds, args.waves
        )
        results["crawl"] = crawl["sec"]
        extras["crawl"] = crawl

    # same crawl with the sharded-Bloom seen pre-filter on — results are
    # byte-identical (tests/test_bloom.py); this measures the routing cost/
    # benefit so BENCH.md carries real numbers for the 10^10-scale path
    if (not only and os.environ.get("BENCH_BLOOM", "1") == "1") or "crawl_bloom" in only:
        crawl_b = bench_crawl(
            spark, sf_dir, args.replicate, args.hosts, args.seeds, args.waves,
            use_bloom=True,
        )
        # extras only: an alternate config of the same workload must not
        # inflate the headline sum (cross-round comparability)
        extras["crawl_bloom"] = crawl_b

    # third config: the cuckoo-filter seen-set family (the north rule names
    # both "partitioned Bloom/cuckoo" variants). Same exactness invariant
    # (tests/test_cuckoo.py: cuckoo-on == filter-off byte-identical); this
    # measures the fingerprint-table routing cost vs the bloom bitmaps
    if (not only and os.environ.get("BENCH_CUCKOO", "1") == "1") or "crawl_cuckoo" in only:
        crawl_c = bench_crawl(
            spark, sf_dir, args.replicate, args.hosts, args.seeds, args.waves,
            use_bloom=True, seen_filter="cuckoo",
        )
        extras["crawl_cuckoo"] = crawl_c

    # optional fourth config: resource-bounded waves (max_urls_per_wave
    # cap) — evidences that per-wave cost is a dial (flat wave seconds,
    # more waves, same URL total). Off by default: BENCH_CAP=<N> enables
    cap = int(os.environ.get("BENCH_CAP", "0"))
    if (cap and not only) or "crawl_capped" in only:
        crawl_cap = bench_crawl(
            spark, sf_dir, args.replicate, args.hosts, args.seeds,
            max_waves=max(args.waves * 4, 24),
            max_urls_per_wave=cap or 30_000,
        )
        extras["crawl_capped"] = crawl_cap

    # fifth config: BOTH scale mechanisms engaged at once — resource-
    # capped waves AND the probabilistic seen filter (VERDICT r2 task 8:
    # they were only ever benched separately). Same closure invariant:
    # identical URL total, more + flatter waves. BENCH_CAP_FILTER picks
    # the filter family (default bloom; 'cuckoo' for the other).
    if (cap and not only) or "crawl_capped_bloom" in only:
        crawl_cb = bench_crawl(
            spark, sf_dir, args.replicate, args.hosts, args.seeds,
            max_waves=max(args.waves * 4, 24),
            max_urls_per_wave=cap or 30_000,
            use_bloom=True,
            seen_filter=os.environ.get("BENCH_CAP_FILTER", "bloom"),
        )
        extras["crawl_capped_bloom"] = crawl_cb

    skip = {"crawl_e2e"}  # superseded by the scaled headline crawl
    median_reps = int(os.environ.get("BENCH_MEDIAN_REPS", "3"))
    query_reps: dict[str, list] = {}
    for name, fn in entry_mod.queries().items():
        if name in skip:
            continue
        if only and name not in only:
            continue
        results[name] = _time_query(
            spark, fn, sf_dir, median_reps, raw=query_reps, name=name
        )
    if query_reps:
        extras["query_reps"] = query_reps

    # Two-tier output (r2 post-mortem: the driver tails the LAST line and
    # one giant line with per-wave arrays outran its capture -> parsed:null).
    # Verbose detail goes to a file + an EARLY stdout line; the FINAL line
    # is a compact summary the driver can always parse.
    detail = {"queries": results, "sf": sf, **extras}
    # Partial (--only) runs must not clobber the full-suite record: the
    # scaling harness shells out with --only crawl and twice overwrote the
    # 78-query detail file. Full runs own BENCH_DETAIL.json; partial runs
    # write a sidecar.
    detail_name = "BENCH_DETAIL.json" if not only else "BENCH_DETAIL.partial.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    print(json.dumps(detail))

    print(json.dumps(final_line(results, extras, sf, int(cpus)),
                     separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
