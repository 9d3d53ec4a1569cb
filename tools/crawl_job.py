#!/usr/bin/env python
"""spark-submit entry point for a production crawl run.

Reads the pages corpus (Iceberg table name or parquet path), the sites
dim, and a seed table/list; runs the BFS crawl with per-wave atomic
checkpointing; resumable with --resume. Shipped to executors via
`tools/submit.sh` (--py-files zip of ieps_crawler_spark).

Examples
--------
Local smoke:
    spark-submit --master 'local[8]' tools/crawl_job.py \
        --corpus /data/pages.parquet --sites /data/sites.parquet \
        --seeds http://example.gov.si/ --ckpt /tmp/ckpt --waves 5

Cluster (Iceberg):
    tools/submit.sh --master yarn --num-executors 200 -- \
        --corpus iceberg_catalog.crawl.pages \
        --sites iceberg_catalog.crawl.sites \
        --seed-table iceberg_catalog.crawl.seeds \
        --ckpt hdfs:///crawl/ckpt --waves 50 --wave-seconds 600
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def _read(spark: SparkSession, ref: str):
    """Iceberg/catalog table name, or a parquet path (contains '/')."""
    if "/" in ref:
        return spark.read.parquet(ref)
    return spark.table(ref)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="pages table: (url, warc_ts, html, text, lang)")
    ap.add_argument("--sites", required=True,
                    help="sites dim: (host, robots_content, sitemap_content)")
    ap.add_argument("--seeds", nargs="*", default=[],
                    help="seed URLs (small lists)")
    ap.add_argument("--seed-table", default=None,
                    help="seed table with (url, pos) — the scalable path")
    ap.add_argument("--ckpt", required=True, help="checkpoint root dir")
    ap.add_argument("--waves", type=int, default=None)
    ap.add_argument("--wave-seconds", type=int, default=600)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--bloom", action="store_true",
                    help="enable the sharded Bloom pre-filter for seen-dedup")
    ap.add_argument("--export-warc", default=None, metavar="DIR",
                    help="after the crawl, export fetched HTML pages "
                         "(their retained extracted text — raw html is "
                         "dropped at the extraction stage by design) as "
                         "deterministic segmented .warc.gz files under DIR")
    ap.add_argument("--warc-segments", type=int, default=64,
                    help="number of WARC segment files (~1 GB each at "
                         "Common Crawl scale; one write task per segment)")
    ap.add_argument("--graph-report", default=None, metavar="DIR",
                    help="after the crawl, write link-graph analytics "
                         "under DIR: the PLD-collapsed domain graph "
                         "(domain_graph/) and, when seeds are known, "
                         "TrustRank + relative spam mass per domain "
                         "seeded at the seed PLDs (domain_trust/); "
                         "prints the report-§4 degree summary row")
    ap.add_argument("--publish-iceberg", default=None, metavar="NAMESPACE",
                    help="after the crawl, publish crawl_results/links/"
                         "metrics/seen as Iceberg tables under this "
                         "namespace (e.g. my_catalog.crawl); requires an "
                         "Iceberg catalog configured on the session")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("ieps_crawler_spark").getOrCreate()
    from ieps_crawler_spark.plans.crawl import Crawler

    crawler = Crawler(
        spark,
        _read(spark, args.corpus),
        _read(spark, args.sites),
        None,
        args.ckpt,
        wave_seconds=args.wave_seconds,
        use_bloom=args.bloom,
    )
    if args.resume:
        stats = crawler.run(resume=True, max_waves=args.waves)
    else:
        seeds = _read(spark, args.seed_table) if args.seed_table else args.seeds
        stats = crawler.run(seeds=seeds, max_waves=args.waves)
    for m in stats.per_wave:
        print(m)
    print(f"waves={stats.waves} fetched={stats.fetched}")

    if args.export_warc:
        from pyspark.sql import functions as F

        from ieps_crawler_spark.sinks.warc_sink import write_warc

        res = crawler.results()
        if res is None:
            print("exported WARC: nothing to export (no crawl results)")
        else:
            pages = res.filter(F.col("page_type") == "HTML").select(
                "url",
                F.col("sched_ts").alias("warc_ts"),
                "http_status",
                F.lit("text/plain; charset=utf-8").alias("content_type"),
                F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
                .alias("html"),
            )
            tot = write_warc(
                pages, args.export_warc, n_segments=args.warc_segments
            ).agg(
                F.coalesce(F.sum("records"), F.lit(0)).alias("r"),
                F.coalesce(F.sum("bytes"), F.lit(0)).alias("b"),
            ).first()
            print(
                f"exported WARC: {tot.r} records / {tot.b} bytes in "
                f"{args.warc_segments} segments under {args.export_warc}"
            )

    if args.graph_report:
        import os as _os

        from pyspark.sql import functions as F

        from ieps_crawler_spark.operators.graph import (
            degree_stats,
            domain_graph,
            seed_plds,
            spam_mass,
        )

        links = crawler.links()
        if links is None:
            print("graph report: no links recorded (nothing fetched)")
        else:
            ds = degree_stats(links, src="from_url", dst="to_url").first()
            print(
                "graph: nodes={0} edges={1} avg_out_permille={2} "
                "max_out={3} max_in={4}".format(
                    ds["n_nodes"], ds["n_edges"],
                    ds["avg_out_degree_permille"],
                    ds["max_out_degree"], ds["max_in_degree"],
                )
            )
            host_edges = links.select(
                F.parse_url(F.col("from_url"), F.lit("HOST"))
                .alias("src_host"),
                F.parse_url(F.col("to_url"), F.lit("HOST"))
                .alias("dst_host"),
            )
            dg = domain_graph(host_edges)
            # two consumers (parquet write + the trust pass) — cache so
            # the links scan + PLD aggregate runs once
            dg.cache()
            dg_dir = _os.path.join(args.graph_report, "domain_graph")
            dg.write.mode("overwrite").parquet(dg_dir)
            print(f"wrote PLD domain graph -> {dg_dir}")

            # seed source of truth (ADVICE r3): the list persisted in
            # the checkpoint at crawl init — a resumed report can never
            # silently derive trust from a different CLI list. CLI
            # seeds are only a fallback for pre-persistence checkpoints.
            seed_urls = crawler.seed_urls()
            seed_src = "checkpoint-persisted seed list"
            if seed_urls is None:
                if args.seed_table:
                    seed_urls = _read(spark, args.seed_table).select(
                        F.col("url")
                    )
                    seed_src = f"--seed-table {args.seed_table}"
                elif args.seeds:
                    seed_urls = spark.createDataFrame(
                        [(u,) for u in args.seeds], "url string"
                    )
                    seed_src = "--seeds argument"
            elif args.resume and (args.seeds or args.seed_table):
                print(
                    "graph report: NOTE --seeds/--seed-table ignored on "
                    "resume; trust set comes from the checkpoint's "
                    "persisted seed list"
                )
            if seed_urls is not None:
                print(f"graph report: trust seeds from {seed_src}")
            trusted = (
                seed_plds(seed_urls) if seed_urls is not None else None
            )
            if seed_urls is None:
                print(
                    "graph report: no seed list (pre-persistence "
                    "checkpoint and no --seeds/--seed-table); skipping "
                    "domain_trust (re-pass seeds to compute TrustRank)"
                )
            elif trusted.isEmpty():
                print(
                    "graph report: no seed URL yielded a parseable host "
                    "(schemeless seeds?); skipping domain_trust — a "
                    "report with an empty trust set would mark EVERY "
                    "domain spam_mass=1.0"
                )
            else:
                trust = spam_mass(
                    dg.select("src_pld", "dst_pld"),
                    trusted,
                    iterations=3,
                    src="src_pld",
                    dst="dst_pld",
                )
                tr_dir = _os.path.join(args.graph_report, "domain_trust")
                trust.write.mode("overwrite").parquet(tr_dir)
                # demotion rule = high PR x high mass (spam_mass
                # docstring): rank by the product, not mass-then-PR —
                # lexicographic order would crowd the list with
                # rank-floor leaf domains at mass exactly 1.0
                worst = (
                    trust.orderBy(
                        (F.col("pagerank") * F.col("spam_mass")).desc(),
                        F.col("node_id").asc(),
                    )
                    .limit(5)
                    .collect()
                )
                print(f"wrote domain TrustRank/spam-mass -> {tr_dir}")
                for r in worst:
                    print(
                        f"  demote candidate: {r['node_id']} "
                        f"pr={r['pagerank']:.4f} mass={r['spam_mass']:.3f}"
                    )
            dg.unpersist()

    if args.publish_iceberg:
        # the tool-driven Iceberg path (catalog-detected): checkpoint
        # state stays in the parquet SnapshotStore/DeltaLog; the crawl
        # OUTPUT tables publish as atomic Iceberg snapshots
        from ieps_crawler_spark.sinks.iceberg import (
            IcebergTableSink,
            iceberg_catalogs,
        )

        cat = args.publish_iceberg.split(".", 1)[0]
        cats = iceberg_catalogs(spark)
        if cat not in cats:
            raise SystemExit(
                f"--publish-iceberg: '{cat}' is not an Iceberg catalog on "
                f"this session (detected: {cats or 'none'}). Configure "
                f"spark.sql.catalog.{cat} and ship the "
                "iceberg-spark-runtime jars (tools/submit.sh --packages)."
            )
        sink = IcebergTableSink(spark, args.publish_iceberg)
        for name, df in (
            ("crawl_results", crawler.results()),
            ("links", crawler.links()),
            ("metrics", crawler.metrics()),
            ("seen", crawler.seen()),
        ):
            if df is not None:
                sink.replace_snapshot(name, df)
                print(f"published {args.publish_iceberg}.{name}")


if __name__ == "__main__":
    main()
