"""WARC sink: segmented write → source roundtrip, byte determinism,
atomic commit naming, manifest accounting, plain vs gzip."""

import datetime as dt
import glob
import hashlib
import os

from pyspark.sql import functions as F

from ieps_crawler_spark.sinks.warc_sink import write_warc
from ieps_crawler_spark.sources.warc import read_warc

TS = dt.datetime(2019, 4, 1, 12, 0, 0)


def _corpus(spark, n=40):
    rows = [
        (
            f"http://h{i % 7}.gov.si/p{i}/",
            TS + dt.timedelta(minutes=i),
            200 if i % 3 else 404,
            "text/html",
            f"<html><body>doc {i}</body></html>".encode(),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, http_status int, "
        "content_type string, html binary",
    )


def _file_hashes(out_dir):
    return {
        os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(out_dir, "segment-*"))
    }


def test_roundtrip_through_source(spark, tmp_path):
    df = _corpus(spark)
    out = str(tmp_path / "segs")
    manifest = write_warc(df, out, n_segments=4).collect()
    assert sum(m.records for m in manifest) == 40
    assert all(m.bytes > 0 for m in manifest)

    back = read_warc(spark, out + "/*.warc.gz")
    got = {
        (r.url, r.warc_ts, r.http_status, r.content_type, bytes(r.html))
        for r in back.collect()
    }
    want = {
        (r.url, r.warc_ts, r.http_status, r.content_type, bytes(r.html))
        for r in df.collect()
    }
    assert got == want


def test_deterministic_bytes_across_runs(spark, tmp_path):
    df = _corpus(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # shuffle the input order for run b: output must not depend on it
    write_warc(df, a, n_segments=3).collect()
    write_warc(df.orderBy(F.desc("url")), b, n_segments=3).collect()
    ha, hb = _file_hashes(a), _file_hashes(b)
    assert ha and ha == hb


def test_plain_warc_and_no_temp_left_behind(spark, tmp_path):
    out = str(tmp_path / "plain")
    manifest = write_warc(_corpus(spark, n=9), out, n_segments=2, gz=False)
    names = sorted(m.warc_file for m in manifest.collect())
    assert all(n.endswith(".warc") for n in names)
    leftovers = glob.glob(os.path.join(out, "*.inprogress-*"))
    assert leftovers == []
    back = read_warc(spark, out + "/*.warc")
    assert back.count() == 9


def test_segment_assignment_is_url_hash(spark, tmp_path):
    out = str(tmp_path / "segs2")
    write_warc(_corpus(spark), out, n_segments=8).collect()
    back = read_warc(spark, out + "/*.warc.gz")
    # every url landed in the crc32(url) % 8 segment it hashes to
    bad = back.withColumn(
        "seg_file",
        F.regexp_extract(F.col("warc_file"), r"segment-(\d+)", 1).cast("int"),
    ).filter(
        (F.crc32(F.col("url")) % 8).cast("int") != F.col("seg_file")
    )
    assert bad.count() == 0


def test_crawl_job_export_warc(spark, tmp_path):
    """tools/crawl_job.py --export-warc archives the crawl's retained
    HTML text as WARC segments readable by the source connector."""
    import sys

    sys.path.insert(0, "tools")
    import crawl_job

    from ieps_crawler_spark.corpus import generate_corpus

    c = generate_corpus(40, seed=7)
    c_dir, s_dir = str(tmp_path / "pages"), str(tmp_path / "sites")
    spark.createDataFrame(c["pages"]).write.parquet(c_dir)
    spark.createDataFrame(c["sites"]).write.parquet(s_dir)
    warc_dir = str(tmp_path / "warc")
    crawl_job.main([
        "--corpus", c_dir, "--sites", s_dir,
        "--seeds", *c["seeds"][:2],
        "--ckpt", str(tmp_path / "ckpt"), "--waves", "2",
        "--export-warc", warc_dir, "--warc-segments", "3",
    ])
    back = read_warc(spark, warc_dir + "/*.warc.gz")
    rows = back.collect()
    assert len(rows) > 0
    assert all(r.content_type.startswith("text/plain") for r in rows)
    assert all(r.http_status == 200 for r in rows)
