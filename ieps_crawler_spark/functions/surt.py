"""SURT keys and CDX-style capture indexes (Common Crawl ecosystem).

Common Crawl publishes a CDX index next to every WARC crawl: one row
per capture, keyed by the SURT (Sort-friendly URI Reordering
Transform) of the URL so that all captures of a host — and all hosts
of a domain — are lexicographically adjacent. The reference crawler
keeps its URL universe in PostgreSQL and never builds an archive
index; this module adds the index step a Common-Crawl-style pipeline
needs between "crawl output" and "anyone can look up a URL".

Simplified SURT implemented here (documented deviations from the full
IA spec: no %-escape normalization, no session-id stripping):

    https://WWW.sub.Host.TLD:8080/A/b?z=9&a=1#frag
        -> tld,host,sub)/a/b?a=1&z=9

i.e. lowercase everything, drop scheme / port / fragment / leading
``www.``, reverse the host labels comma-joined, ``)`` separator, then
the path with query parameters sorted (so semantically-equal URLs with
reordered params share a key).

Scale posture: every transform is a built-in expression (regexp /
split / reverse / array_sort) — whole-stage-codegen JVM work, no
Python. ``cdx_index`` output is range-partitioned by key and sorted
within partitions, which is exactly the layout a sharded CDX file set
wants: globally ordered across files WITHOUT a single-reducer sort
(Spark's range partitioner samples key bounds, so 100 TB of captures
sort as ~#partitions independent local sorts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key(url) -> Column:
    """SURT key expression for a URL column (JVM-side only)."""
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    rest = F.regexp_replace(u, "^[a-z][a-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, "^([^/?#]*)", 1)
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":[0-9]+$", ""), r"^www\.", ""
    )
    pathq = F.regexp_replace(
        F.substr(rest, F.length(hostport) + F.lit(1)), "#.*$", ""
    )
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    qnorm = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&"))
    )
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev_host, F.lit(")"), path, qnorm)


def cdx_index(
    df: DataFrame,
    url: str = "url",
    ts: str = "warc_ts",
    status: str = "http_status",
    mime: str = "content_type",
    body: str = "html",
    n_shards: int | None = None,
) -> DataFrame:
    """CDX-style capture index: (urlkey, ts_s, url, mime, status,
    digest, length) — one row per capture, globally ordered by
    (urlkey, ts_s) across range-partitioned shards.

    ``digest`` is the engine's content hash (upper-hex SHA-256, the
    same HashGenerator.scala:7-15 parity hash the dedup path uses)
    rather than classic CDX SHA-1/base32 — one hash family everywhere
    means the index digest joins directly against the crawl's
    duplicate marks.
    """
    idx = df.select(
        surt_key(url).alias("urlkey"),
        F.date_format(F.col(ts), "yyyyMMddHHmmss").alias("ts_s"),
        F.col(url).alias("url"),
        F.col(mime).alias("mime"),
        F.col(status).cast("int").alias("status"),
        F.upper(F.sha2(F.col(body), 256)).alias("digest"),
        F.length(F.col(body)).cast("bigint").alias("length"),
    )
    if n_shards:
        idx = idx.repartitionByRange(n_shards, "urlkey", "ts_s")
    return idx.sortWithinPartitions("urlkey", "ts_s")
