"""Derive a deterministic Common-Crawl-shaped web corpus from the driver's
``documents`` parquet table — pure DataFrame expressions, no Python loops.

Used by ``__spark_entry__.entry`` (flagship crawl on sf0.001) and by
``bench.py`` (sf0.1 throughput): each document row becomes one HTML page in
the input_hint shape ``(url, warc_ts, html, text, lang)``; links between
pages are arithmetic functions of ``doc_id`` so the link graph, the BFS
reach, and every crawl output are deterministic.

Shape choices mirror the reference's world (SURVEY §1.4):
- hosts ``h{0..n-1}.gov.si`` — inside the reference's "gov.si" scope filter
  (ExtractFromHTML.scala:86-88), heavy-tailed via ``doc_id % n_hosts`` with
  a quadratic skew term so host 0 gets ~2x traffic (skew-handling is real).
- even hosts publish robots.txt with ``Disallow: /x`` + ``Crawl-delay: 1``;
  odd hosts have none (4000 ms default, SiteRobotsTxt.scala:18).
- every 7th page links to a dead URL (INVALID/404 path) and every 10th to a
  ``.pdf`` (binary-doc path, ExtractFromHTML.scala:20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _host(doc_id_col, n_hosts: int = 8):
    # quadratic fold: ids whose square mod 2n lands low map to host 0/1 more
    # often -> heavy-tailed host sizes without any data-dependent input
    return F.concat(F.lit("h"), (F.pmod(doc_id_col * doc_id_col + doc_id_col, n_hosts)).cast("string"), F.lit(".gov.si"))


def _url(doc_id_col, n_hosts: int = 8):
    return F.concat(F.lit("http://"), _host(doc_id_col, n_hosts), F.lit("/d"), doc_id_col.cast("string"), F.lit("/"))


def web_from_documents(
    spark: SparkSession,
    sf_dir: str,
    replicate: int = 1,
    n_hosts: int = 8,
    n_seeds: int = 3,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Returns (pages, sites, seeds). pages has the input_hint shape.

    ``replicate`` > 1 blows the corpus up deterministically (bench scale):
    each replica r re-derives doc_id' = doc_id + r*|docs|, so links and the
    BFS reach stay pure functions of the id space. ``n_hosts`` controls the
    politeness-partitioning width (a 10^10 frontier has millions of hosts;
    bench runs use hundreds so no single host serializes a wave)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    base = docs.count()
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("_rep"))
        docs = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("_rep") * base).alias("doc_id"), "text", "lang"
        )
    total = base * replicate
    d = F.col("doc_id")
    t1 = F.pmod(d * 7 + 1, F.lit(total))
    t2 = F.pmod(d * 13 + 5, F.lit(total))
    t3 = F.pmod(d + 1, F.lit(total))
    clean = F.regexp_replace(F.col("text"), r'[<>&"]', " ")
    dead = F.concat(F.lit("http://"), _host(d, n_hosts), F.lit("/dead"), d.cast("string"), F.lit("/"))
    pdf = F.concat(F.lit("http://"), _host(d, n_hosts), F.lit("/files/f"), d.cast("string"), F.lit(".pdf"))
    html_str = F.concat(
        F.lit("<html><head><title>doc "), d.cast("string"), F.lit("</title></head><body><h1>d"),
        d.cast("string"), F.lit("</h1><p>"), clean, F.lit("</p>"),
        F.concat(F.lit('<a href="'), _url(t1, n_hosts), F.lit('">next</a>')),
        F.concat(F.lit('<a href="'), _url(t2, n_hosts), F.lit('">more</a>')),
        F.concat(F.lit('<a href="'), _url(t3, n_hosts), F.lit('">succ</a>')),
        F.when(d % 7 == 0, F.concat(F.lit('<a href="'), dead, F.lit('">gone</a>'))).otherwise(F.lit("")),
        F.when(d % 10 == 0, F.concat(F.lit('<a href="'), pdf, F.lit('">doc</a>'))).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = docs.select(
        _url(d, n_hosts).alias("url"),
        F.lit("2019-04-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        clean.alias("text"),
        F.col("lang"),
    )
    sites_rows = []
    for h in range(n_hosts):
        robots = (
            "User-agent: *\nDisallow: /x\nCrawl-delay: 1\n" if h % 2 == 0 else None
        )
        sites_rows.append((f"h{h}.gov.si", robots, None))
    sites = spark.createDataFrame(
        sites_rows, "host string, robots_content string, sitemap_content string"
    )
    stride = max(1, total // max(n_seeds, 1)) if n_seeds > 3 else 1
    seeds = [
        f"http://h{(i * i + i) % n_hosts}.gov.si/d{i}/"
        for i in (j * stride for j in range(n_seeds))
        if i < total
    ]
    return pages, sites, seeds


def seeds_df(
    spark: SparkSession, total: int, n_hosts: int, n_seeds: int
) -> DataFrame:
    """DataFrame twin of the seed list above ((url, pos) rows) — the
    scalable seed path: a 10^6+-URL seed set is a table, not a driver-side
    Python list."""
    stride = max(1, total // max(n_seeds, 1)) if n_seeds > 3 else 1
    i = F.col("id") * stride
    return (
        spark.range(n_seeds)
        .filter(i < total)
        .select(
            F.concat(
                F.lit("http://h"),
                F.pmod(i * i + i, F.lit(n_hosts)).cast("string"),
                F.lit(".gov.si/d"),
                i.cast("string"),
                F.lit("/"),
            ).alias("url"),
            F.col("id").alias("pos"),
        )
    )
