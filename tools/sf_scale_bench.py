#!/usr/bin/env python
"""sf0.1 -> sf1 spot-bench for the slowest queries (VERDICT r4 #9):
convert the "plans scale" argument into a measured per-family scaling
curve.

No sf1 testdata exists in the sandbox, so an sf1-equivalent input is
DERIVED from /root/testdata/sf0.1 (never synthesized from scratch,
never written into /root/testdata): the tables the slow queries read
are replicated x10 via DuckDB with keys shifted per replica —

- lineitem: l_orderkey / l_partkey / l_suppkey shifted by replica
  (the graph queries hash these into a fixed 20k-node space, so x10
  rows densify the graph exactly as a real sf1 lineitem would);
- documents: doc_id shifted, text kept (duplicate text across
  replicas is realistic corpus behavior for the dedup/DSIR families);
- embeddings: vec_id shifted AND the vector circularly rotated by the
  replica index — rotation preserves the norm and the coordinate
  distribution while decorrelating replicas, so the near-dup pair
  density stays sf-like instead of exploding quadratically the way
  verbatim vector copies would;
- every other table is copied through unscaled (the slow families
  never read them).

Then each listed query runs at BOTH scales in one process per scale
(median-of-3 via bench.py's standard path) and the x10-data time
ratio is reported — linear plans land near the cost ratio of their
dominant stage; anything super-linear is called out.

Usage: python tools/sf_scale_bench.py [--out /tmp/sf1x]
       [--queries q1,q2,...] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"

# the r4 slowest-10 (BENCH_DETAIL.json) + the new r5 sampled tier for
# the exact-vs-sampled clustering scaling contrast
DEFAULT_QUERIES = [
    "graph_hyperball", "dedup_semantic", "graph_opic", "graph_clustering",
    "graph_clustering_approx", "graph_diameter", "graph_components",
    "dedup_cluster_canonical", "graph_trustrank", "dedup_minhash_lsh",
    "pipeline_dsir_weights",
]

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_sf1x(out_dir: str, factor: int = 10) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT i FROM range({factor}) t(i)")

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)"
        )

    li = f"read_parquet('{SRC}/lineitem.parquet')"
    base = con.execute(
        f"SELECT max(l_orderkey), max(l_partkey), max(l_suppkey) FROM {li}"
    ).fetchone()
    ob, pb, sb = (int(x) + 1 for x in base)
    copy(
        f"SELECT * REPLACE (l_orderkey + i*{ob} AS l_orderkey, "
        f"l_partkey + i*{pb} AS l_partkey, "
        f"l_suppkey + i*{sb} AS l_suppkey) FROM {li}, reps",
        "lineitem",
    )

    dc = f"read_parquet('{SRC}/documents.parquet')"
    db = int(con.execute(f"SELECT max(doc_id) FROM {dc}").fetchone()[0]) + 1
    copy(f"SELECT * REPLACE (doc_id + i*{db} AS doc_id) FROM {dc}, reps",
         "documents")

    em = f"read_parquet('{SRC}/embeddings.parquet')"
    eb = int(con.execute(f"SELECT max(vec_id) FROM {em}").fetchone()[0]) + 1
    copy(
        f"SELECT * REPLACE (vec_id + i*{eb} AS vec_id, "
        f"list_concat(embedding[i+1:], embedding[1:i]) AS embedding) "
        f"FROM {em}, reps",
        "embeddings",
    )

    for t in ALL_TABLES:
        if t in ("lineitem", "documents", "embeddings"):
            continue
        copy(f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')", t)
    con.close()


def run_suite(sf_dir: str, queries: list[str], cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--only", ",".join(queries)],
        env=env, cwd=REPO, capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-2])["queries"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]

    if not args.skip_build:
        build_sf1x(args.out)
        print(json.dumps({"built": args.out}), flush=True)

    small = run_suite(SRC, queries, args.cpus)
    print(json.dumps({"sf0.1": small}), flush=True)
    big = run_suite(args.out, queries, args.cpus)
    print(json.dumps({"sf1x": big}), flush=True)

    rows = []
    for q in queries:
        a, b = small.get(q), big.get(q)
        if a and b:
            rows.append((q, a, b, round(b / a, 2)))
    rows.sort(key=lambda r: -r[3])
    print("\n| query | sf0.1 s | sf1(x10) s | ratio |")
    print("|---|---|---|---|")
    for q, a, b, r in rows:
        print(f"| {q} | {a} | {b} | {r}x |")
    print(json.dumps({"ratios": {q: r for q, _, _, r in rows}}))


if __name__ == "__main__":
    main()
