"""WARC source connector: writer→reader roundtrip, gzip, non-response
skipping, malformed-record resilience, multi-file parallel scan."""

import datetime as dt
import gzip
import os

from ieps_crawler_spark.sources.warc import (
    build_warc_bytes,
    parse_warc_bytes,
    read_warc,
)

TS = dt.datetime(2019, 4, 1, 12, 0, 0)


def _recs(k, n=3):
    return [
        {
            "url": f"http://h{k}.gov.si/p{i}/",
            "ts": TS + dt.timedelta(hours=i),
            "status": 200 if i % 2 == 0 else 404,
            "content_type": "text/html",
            "body": f"<html><body>doc {k}-{i}</body></html>".encode(),
        }
        for i in range(n)
    ]


def test_parse_roundtrip_pure_python():
    recs = _recs(0)
    rows = parse_warc_bytes(build_warc_bytes(recs), "f.warc")
    assert len(rows) == 3
    for rec, (url, ts, status, ctype, body, src) in zip(recs, rows):
        assert url == rec["url"] and ts == rec["ts"]
        assert status == rec["status"] and ctype == "text/html"
        assert body == rec["body"] and src == "f.warc"


def test_parse_skips_non_response_and_garbage():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: 2019-04-01T00:00:00Z\r\n"
        b"Content-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    good = build_warc_bytes(_recs(1, n=1))
    garbage = b"NOT A WARC HEADER\r\n\r\n"
    rows = parse_warc_bytes(info + good + garbage, "x.warc")
    assert len(rows) == 1 and rows[0][0] == "http://h1.gov.si/p0/"


def test_parse_gzip_whole_file():
    data = gzip.compress(build_warc_bytes(_recs(2, n=2)))
    assert len(parse_warc_bytes(data, "x.warc.gz")) == 2


def test_read_warc_multi_file(spark, tmp_path):
    for k in range(4):
        mode, ext = ("plain", "warc") if k % 2 == 0 else ("gz", "warc.gz")
        raw = build_warc_bytes(_recs(k, n=5))
        if mode == "gz":
            raw = gzip.compress(raw)
        (tmp_path / f"seg{k}.{ext}").write_bytes(raw)
    df = read_warc(spark, f"file://{tmp_path}/*")
    rows = df.collect()
    assert len(rows) == 20
    got = {(r["url"], r["http_status"]) for r in rows}
    assert ("http://h3.gov.si/p4/", 200) in got
    assert ("http://h0.gov.si/p1/", 404) in got
    one = [r for r in rows if r["url"] == "http://h2.gov.si/p3/"][0]
    assert bytes(one["html"]) == b"<html><body>doc 2-3</body></html>"
    assert one["warc_ts"] == TS + dt.timedelta(hours=3)
    assert os.path.basename(one["warc_file"]).startswith("seg2")
