"""WET sink/source (Common Crawl extracted-text sidecar): segmented
write → read_wet roundtrip, byte determinism, unicode + empty text,
record-type isolation from the WARC response parser."""

import datetime as dt
import glob
import gzip
import hashlib
import os

from pyspark.sql import functions as F

from ieps_crawler_spark.sinks.warc_sink import write_wet
from ieps_crawler_spark.sources.warc import (
    build_wet_record,
    parse_wet_bytes,
    read_wet,
)

TS = dt.datetime(2019, 4, 1, 12, 0, 0)


def _texts(spark, n=30):
    rows = [
        (
            f"http://h{i % 5}.gov.si/p{i}/",
            TS + dt.timedelta(minutes=i),
            # exercise unicode, empties, and CRLF-free plain prose
            "občina čšž" if i % 7 == 0 else ("" if i % 11 == 0 else f"doc {i} text"),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )


def test_wet_roundtrip(spark, tmp_path):
    df = _texts(spark)
    out = str(tmp_path / "wet")
    manifest = write_wet(df, out, n_segments=4).collect()
    assert sum(m.records for m in manifest) == 30
    assert all(m.warc_file.endswith(".warc.wet.gz") for m in manifest)
    back = read_wet(spark, f"file://{out}/*")
    got = {
        r["url"]: (r["warc_ts"], r["text"]) for r in back.collect()
    }
    want = {r["url"]: (r["warc_ts"], r["text"]) for r in df.collect()}
    assert got == want


def test_wet_bytes_deterministic(spark, tmp_path):
    df = _texts(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_wet(df, a, n_segments=3).collect()
    # different input order must not change output bytes
    write_wet(df.orderBy(F.desc("url")), b, n_segments=3).collect()

    def hashes(d):
        return {
            os.path.basename(p): hashlib.sha256(
                open(p, "rb").read()
            ).hexdigest()
            for p in glob.glob(os.path.join(d, "segment-*"))
        }

    ha, hb = hashes(a), hashes(b)
    assert ha and ha == hb


def test_wet_tie_rows_deterministic(spark, tmp_path):
    # equal (url, warc_ts) with DIFFERENT payloads: the md5 row
    # tiebreak must order them identically run to run
    rows = [
        ("http://a.si/t", TS, "zz alt"),
        ("http://a.si/t", TS, "aa alt"),
        ("http://a.si/u", TS, "only"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    a, b = str(tmp_path / "ta"), str(tmp_path / "tb")
    write_wet(df, a, n_segments=2).collect()
    write_wet(
        spark.createDataFrame(
            list(reversed(rows)), "url string, warc_ts timestamp, text string"
        ),
        b,
        n_segments=2,
    ).collect()

    def hashes(d):
        return {
            os.path.basename(p): hashlib.sha256(
                open(p, "rb").read()
            ).hexdigest()
            for p in glob.glob(os.path.join(d, "segment-*"))
        }

    ha, hb = hashes(a), hashes(b)
    assert ha and ha == hb


def test_wet_record_shape():
    rec = build_wet_record({"url": "http://x.si/", "ts": TS, "text": "ab ž"})
    head, _, body = rec.partition(b"\r\n\r\n")
    assert b"WARC-Type: conversion" in head
    assert b"Content-Type: text/plain" in head
    # Content-Length counts BYTES of the UTF-8 payload, not chars
    assert f"Content-Length: {len('ab ž'.encode())}".encode() in head
    assert body == "ab ž".encode() + b"\r\n\r\n"
    # deterministic refers-to digest, no UUIDs
    assert hashlib.sha256("ab ž".encode()).hexdigest().encode() in head


def test_negative_content_length_terminates():
    # adversarial header: length = -(header+4) would move the scan
    # cursor BACKWARDS and wedge the task forever without the guard
    from ieps_crawler_spark.sources.warc import parse_warc_bytes

    poison = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -54\r\n\r\n"
    )
    good = build_wet_record({"url": "http://x.si/c", "ts": TS, "text": "t"})
    # both parsers share the framing walk: each must terminate and
    # simply stop at the unframeable record
    assert parse_warc_bytes(poison + good) == []
    assert parse_wet_bytes(poison + good) == []
    # and a poison record AFTER a good one keeps the good one
    rows = parse_wet_bytes(good + poison)
    assert [(r[0], r[2]) for r in rows] == [("http://x.si/c", "t")]


def test_wet_parser_skips_response_records(tmp_path):
    from ieps_crawler_spark.sources.warc import build_warc_record

    mixed = build_warc_record(
        {
            "url": "http://x.si/r",
            "ts": TS,
            "status": 200,
            "content_type": "text/html",
            "body": b"<html>r</html>",
        }
    ) + build_wet_record({"url": "http://x.si/c", "ts": TS, "text": "plain"})
    rows = parse_wet_bytes(mixed)
    assert [(r[0], r[2]) for r in rows] == [("http://x.si/c", "plain")]
    # and gz input is sniffed by magic bytes
    rows_gz = parse_wet_bytes(gzip.compress(mixed))
    assert rows == rows_gz
