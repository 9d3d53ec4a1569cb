"""Static StructType schemas for every engine table (SURVEY §1.4).

The reference's schema is fixed/static (slick-codegen from crawldb.sql);
we mirror that with explicit StructTypes — DataFrames only, no RDDs.

``PAGES`` is the BASELINE.json input_hint shape (Common-Crawl-style
corpus). ``FRONTIER`` is the Spark re-expression of the reference's
``QueuePageEntry`` (queue/Queue.scala:38): data_type 0=page 1=image
2=binary-data, ``ref_url`` the parent page (link-graph edge source),
``enq_seq`` the deterministic per-(host, wave) FIFO position replacing
BigQueue file order. ``CRAWL_RESULTS.page_type`` carries the reference's
six-state lifecycle (crawldb.sql:113-119).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input_hint: (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# reference `site` table (crawldb.sql:17-25) reshaped host-keyed
SITES = StructType(
    [
        StructField("host", StringType(), False),
        StructField("robots_content", StringType(), True),
        StructField("sitemap_content", StringType(), True),
    ]
)

# auxiliary fixture: nested sitemap bodies keyed by sitemap URL
SITEMAP_BODIES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("content", StringType(), True),
    ]
)

FRONTIER = StructType(
    [
        StructField("canon_url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("data_type", IntegerType(), False),  # 0 page, 1 img, 2 data
        StructField("ref_url", StringType(), True),
        StructField("wave", IntegerType(), False),  # wave the row was enqueued
        StructField("priority", IntegerType(), False),
        StructField("enq_seq", LongType(), False),  # FIFO pos within (host, wave)
    ]
)

SEEN = StructType([StructField("canon_url", StringType(), False)])

CRAWL_RESULTS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("kind", StringType(), False),  # PAGE / IMG / DATA
        StructField("page_type", StringType(), False),  # crawldb.sql:113-119
        StructField("http_status", IntegerType(), True),
        StructField("content_hash", StringType(), True),
        StructField("wave", IntegerType(), False),
        StructField("fetch_order", LongType(), False),  # per-host rank in wave
        StructField("sched_ts", TimestampType(), True),  # simulated politeness clock
        StructField("load_time_ms", LongType(), True),  # page.load_time model
        StructField("text", StringType(), True),
        StructField("data_type_code", StringType(), True),  # PDF/DOC/... for DATA
    ]
)

# reference page_data/image tables (crawldb.sql:47-70): content persisted
# only for seed-host assets (download flag)
ASSETS = StructType(
    [
        StructField("page_url", StringType(), True),
        StructField("asset_url", StringType(), False),
        StructField("kind", StringType(), False),  # IMG / DATA
        StructField("content", BinaryType(), True),
        StructField("content_hash", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

LINKS = StructType(
    [
        StructField("from_url", StringType(), False),
        StructField("to_url", StringType(), False),
    ]
)

METRICS = StructType(
    [
        StructField("wave", IntegerType(), False),
        StructField("hosts", LongType(), False),
        StructField("fetched", LongType(), False),
        StructField("html_pages", LongType(), False),
        StructField("invalid", LongType(), False),
        StructField("disallowed", LongType(), False),
        StructField("duplicates", LongType(), False),
        StructField("new_links", LongType(), False),
        StructField("frontier_pending", LongType(), False),
        StructField("elapsed_sec", StringType(), True),
    ]
)

PAGE_TYPES = ["HTML", "BINARY", "DUPLICATE", "FRONTIER", "INVALID", "DISALLOWED"]
DATA_TYPES = ["PDF", "DOC", "DOCX", "PPT", "PPTX"]
