"""SURT key + CDX index: known-key literals, query-param sorting,
www/port/fragment dropping, global order across range shards."""

import datetime as dt

from pyspark.sql import functions as F

from ieps_crawler_spark.functions.surt import cdx_index, surt_key

CASES = [
    ("https://example.com/", "com,example)/"),
    ("HTTP://WWW.Example.COM:8080/A/B?z=9&a=1#frag",
     "com,example)/a/b?a=1&z=9"),
    ("http://sub.h3.gov.si/path", "si,gov,h3,sub)/path"),
    ("https://h1.gov.si", "si,gov,h1)/"),
    ("http://h2.gov.si/p?single=1", "si,gov,h2)/p?single=1"),
    # www only strips as a LEADING label
    ("http://notwww.example.org/x", "org,example,notwww)/x"),
]


def test_surt_known_keys(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r.k for r in df.select(surt_key("url").alias("k")).collect()]
    assert got == [k for _, k in CASES]


def test_cdx_index_columns_and_order(spark):
    ts = dt.datetime(2019, 4, 1, 12, 30, 5)
    rows = [
        (f"http://h{i % 3}.gov.si/p{i}", ts + dt.timedelta(seconds=i),
         200, "text/html", f"body {i}".encode())
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, http_status int, "
        "content_type string, html binary",
    )
    idx = cdx_index(df, n_shards=4)
    assert idx.columns == [
        "urlkey", "ts_s", "url", "mime", "status", "digest", "length",
    ]
    pdf = idx.toPandas()  # preserves partition order then within-sort
    keys = list(zip(pdf["urlkey"], pdf["ts_s"]))
    assert keys == sorted(keys)  # globally ordered across range shards
    assert (pdf["ts_s"].str.len() == 14).all()
    assert (pdf["digest"].str.len() == 64).all()
    assert (pdf["digest"] == pdf["digest"].str.upper()).all()


def test_cdx_digest_joins_dedup_hash(spark):
    # same content -> same digest as the crawl's upper(sha2) dup hash
    df = spark.createDataFrame(
        [("http://a.si/x", dt.datetime(2019, 4, 1), 200, "text/html",
          b"same"),
         ("http://b.si/y", dt.datetime(2019, 4, 2), 200, "text/html",
          b"same")],
        "url string, warc_ts timestamp, http_status int, "
        "content_type string, html binary",
    )
    idx = cdx_index(df)
    want = df.select(
        F.upper(F.sha2(F.col("html"), 256)).alias("h")
    ).distinct().collect()[0].h
    assert {r.digest for r in idx.collect()} == {want}
