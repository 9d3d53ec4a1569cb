#!/usr/bin/env python
"""Turbo-proof N→4N scaling-efficiency measurement (VERDICT r4 #2).

The classic pair (tools/scaling_bench.py, BENCH_SCALING.md) measures a
SOLO 1-executor run as the denominator — on an otherwise idle box that
single busy core gets full turbo and an uncontended memory bus, which
mathematically compresses measured efficiency for ANY code (the r4 2x2
drift control showed the identical r3 binary re-measuring 0.76 on a day
it had recorded 0.80-0.88). This tool measures the denominator UNDER
MATCHED CONTENTION, per the judge's prescription: the 1-executor level
runs as FOUR CONCURRENT, fully independent 1-executor jobs on disjoint
on-disk inputs (each subprocess materializes its own bucketed corpus
table in its own warehouse; only the read-only sf parquet source is
shared, equally hot for every run at every level). Four busy executor
cores put the package in the same turbo/bus state as the 4-executor
level, so the comparison isolates the engine's coordination cost —
which is exactly what "scaling efficiency between cluster sizes" means
when the hardware cannot grow with N.

    matched efficiency = R(one 4-exec job)
                         / Σ per-job R(four concurrent 1-exec jobs)

A perfectly-scaling engine hits 1.0: one coordinated 4-executor job
moves URLs exactly as fast as four uncoordinated single-executor jobs
using the same four cores. Anything lost to shuffle/barrier/driver
coordination shows up below 1.0. The solo 1-exec run is ALSO taken
(same session, same box-weather) so both methodologies land in the same
table; the concurrent level burns ~4 driver-JVM cores the 4-exec level
doesn't, which biases the matched denominator slightly SLOW — reported,
not corrected.

Requires the standalone cluster: tools/cluster.sh start (the tool
starts/stops it itself if asked with --manage-cluster).

Usage: python tools/scaling_matched.py [--replicate 1000]
       [--seeds 1000000] [--waves 2] [--hosts 256] [--skip-solo]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER = "spark://127.0.0.1:7077"


def _conf(cores_max: int, driver_mem: str, exec_mem: str) -> str:
    return json.dumps(
        {
            "spark.cores.max": str(cores_max),
            "spark.executor.cores": "1",
            "spark.executor.memory": exec_mem,
            "spark.executorEnv.PYTHONPATH": REPO,
        }
    )


def _cmd(args) -> list[str]:
    return [
        sys.executable, os.path.join(REPO, "bench.py"), "--only", "crawl",
        "--replicate", str(args.replicate), "--seeds", str(args.seeds),
        "--waves", str(args.waves), "--hosts", str(args.hosts),
    ]


def _env(cores_max: int, driver_mem: str, exec_mem: str) -> dict:
    return dict(
        os.environ,
        SPARK_GRAFT_MASTER=MASTER,
        SPARK_GRAFT_CPUS=str(cores_max),
        SPARK_GRAFT_CONF=_conf(cores_max, driver_mem, exec_mem),
        SPARK_DRIVER_MEM=driver_mem,
    )


def _crawl_of(stdout: str) -> dict:
    return json.loads(stdout.strip().splitlines()[-1])["crawl"]


def run_four_exec(args) -> dict:
    out = subprocess.run(
        _cmd(args), env=_env(4, "16g", "14g"), cwd=REPO,
        capture_output=True, text=True, check=True,
    )
    return _crawl_of(out.stdout)


def run_concurrent_ones(args, n_jobs: int = 4) -> list[dict]:
    procs = [
        subprocess.Popen(
            _cmd(args), env=_env(1, "10g", "12g"), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for _ in range(n_jobs)
    ]
    results = []
    for p in procs:
        stdout, stderr = p.communicate()
        if p.returncode != 0:
            raise RuntimeError(
                f"concurrent 1-exec job failed rc={p.returncode}: "
                f"{stderr[-2000:]}"
            )
        results.append(_crawl_of(stdout))
    return results


def run_solo_one(args) -> dict:
    out = subprocess.run(
        _cmd(args), env=_env(1, "16g", "14g"), cwd=REPO,
        capture_output=True, text=True, check=True,
    )
    return _crawl_of(out.stdout)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=1000)
    ap.add_argument("--seeds", type=int, default=1_000_000)
    ap.add_argument("--waves", type=int, default=2)
    ap.add_argument("--hosts", type=int, default=256)
    ap.add_argument("--skip-solo", action="store_true")
    ap.add_argument("--manage-cluster", action="store_true")
    args = ap.parse_args()

    if args.manage_cluster:
        subprocess.run(
            ["bash", os.path.join(REPO, "tools", "cluster.sh"), "start"],
            check=True,
        )
        time.sleep(5)
    try:
        t0 = time.time()
        four = run_four_exec(args)
        print(json.dumps({"level": "4x1-exec", **{k: four[k] for k in (
            "urls", "wave_sec", "urls_per_sec")}}), flush=True)
        ones = run_concurrent_ones(args)
        for i, c in enumerate(ones):
            print(json.dumps({"level": f"1-exec concurrent #{i}",
                              **{k: c[k] for k in (
                                  "urls", "wave_sec", "urls_per_sec")}}),
                  flush=True)
        solo = None
        if not args.skip_solo:
            solo = run_solo_one(args)
            print(json.dumps({"level": "1-exec solo", **{k: solo[k] for k in (
                "urls", "wave_sec", "urls_per_sec")}}), flush=True)
        wall = time.time() - t0
    finally:
        if args.manage_cluster:
            subprocess.run(
                ["bash", os.path.join(REPO, "tools", "cluster.sh"), "stop"],
                check=False,
            )

    agg = sum(c["urls_per_sec"] for c in ones)
    matched_eff = four["urls_per_sec"] / agg
    closures = {c["urls"] for c in ones} | {four["urls"]}
    lines = [
        "",
        "## Round 5: matched-contention N->4N (turbo-proof control)",
        "",
        "Denominator measured under the SAME turbo/bus conditions as the",
        "numerator (VERDICT r4 #2): the 1-executor level ran as four",
        "CONCURRENT independent 1-exec jobs on disjoint materialized",
        "corpora (only the read-only sf parquet source is shared); four",
        "busy executor cores put the package in the 4-exec power state, so",
        "the solo-run turbo asymmetry that compressed the r4-day numbers",
        "cannot occur. matched efficiency = R(4-exec job) / sum of per-job",
        "R over the four concurrent 1-exec jobs — 1.0 means coordination",
        "is free; the four extra driver JVMs bias the denominator slightly",
        "SLOW (reported, not corrected). Same job spec as the standing",
        f"record: {args.replicate}x replicate, {args.seeds:,} seeds,",
        f"{args.waves} waves, {args.hosts} hosts; closure sizes seen: "
        f"{sorted(closures)}.",
        "",
        "| level | URLs | wave sec | URLs/sec |",
        "|---|---|---|---|",
        f"| 4 x 1-core executors (one job) | {four['urls']:,} | "
        f"{four['wave_sec']} | {four['urls_per_sec']:,} |",
    ]
    for i, c in enumerate(ones):
        lines.append(
            f"| 1 x 1-core executor, concurrent job {i} | {c['urls']:,} | "
            f"{c['wave_sec']} | {c['urls_per_sec']:,} |"
        )
    if solo:
        lines.append(
            f"| 1 x 1-core executor, solo (classic denominator) | "
            f"{solo['urls']:,} | {solo['wave_sec']} | "
            f"{solo['urls_per_sec']:,} |"
        )
    lines += [
        "",
        f"- concurrent 1-exec aggregate: **{agg:,.1f} urls/s** "
        f"(per-job mean {agg / len(ones):,.1f})",
        f"- **matched-contention efficiency: {matched_eff:.2f}**",
    ]
    if solo:
        classic = four["urls_per_sec"] / (4 * solo["urls_per_sec"])
        lines += [
            f"- classic solo-denominator efficiency, same session: "
            f"{classic:.2f} (the turbo-exposed methodology, for "
            f"continuity with r2-r4 records)",
        ]
    lines += [f"- total harness wall: {wall / 60:.1f} min", ""]
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write("\n".join(lines))
    print(json.dumps({
        "matched_efficiency": round(matched_eff, 3),
        "four_exec_urls_per_sec": four["urls_per_sec"],
        "concurrent_agg_urls_per_sec": round(agg, 1),
        "solo_urls_per_sec": solo["urls_per_sec"] if solo else None,
    }))
    print("appended to BENCH_SCALING.md")


if __name__ == "__main__":
    main()
