"""WARC source connector (ISO 28500 — Common Crawl's native format).

The north-star input is "an Iceberg table of Common-Crawl-style web
pages"; the step BEFORE that table exists is ingesting raw WARC
segments. This module reads ``response`` records out of ``.warc`` /
``.warc.gz`` files into the engine's corpus shape — (url, warc_ts,
http_status, content_type, html) — so a crawl/curation pipeline can
start from the archive files themselves:

    corpus = read_warc(spark, "s3a://bucket/segments/*.warc.gz")

Reference parity note: the reference fetches live HTTP
(HeadlessBrowser.scala:47-105) and has no archive ingestion; this is a
round-2 addition in the "Scans/sources" category (SURVEY §2.2).

Scale posture: one task per WARC file (``binaryFile`` source), parsing
inside ``mapInPandas`` — file-granular Python, never per-row; Common
Crawl ships ~1 GB segment files, so a 100 TB ingest is ~100k
well-sized, independently-parsed tasks with no shuffle at all. The
record parser is a single linear scan over each file's bytes.
Writer (``build_warc_bytes``) exists for tests/fixtures: deterministic
output (fixed ordering, no random record ids) so goldens are stable.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "url string, warc_ts timestamp, http_status int, "
    "content_type string, html binary, warc_file string"
)

_CRLF = b"\r\n"


# ------------------------------------------------------------------ writer

def build_warc_record(r: dict) -> bytes:
    """Serialize ONE response record to WARC/1.0 bytes. Record dict:
    {url, ts (datetime), status (int), content_type, body (bytes)}.
    Headers encode as UTF-8 (WARC/1.0 named fields are UTF-8): a raw
    IRI url like http://obcina.si/občina/ must not poison a segment
    task with UnicodeEncodeError. Content-Length counts BYTES, so the
    payload boundary stays exact regardless of header width."""
    http_head = (
        f"HTTP/1.1 {r['status']} OK\r\n"
        f"Content-Type: {r['content_type']}\r\n"
        f"Content-Length: {len(r['body'])}\r\n\r\n"
    ).encode("utf-8")
    payload = http_head + r["body"]
    ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {r['url']}\r\n"
        f"WARC-Date: {ts}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    return head + payload + _CRLF + _CRLF


def build_wet_record(r: dict) -> bytes:
    """Serialize ONE extracted-text record to WET (WARC conversion)
    bytes — the Common Crawl *.warc.wet.gz layout: WARC-Type
    ``conversion``, payload = the plain UTF-8 text with no HTTP
    envelope. Record dict: {url, ts (datetime), text (str)}.
    ``WARC-Refers-To`` (normally a UUID pointing at the response
    record) is a deterministic content digest here — the sink's
    byte-identical-rerun contract forbids UUIDs and wall clock."""
    body = (r["text"] or "").encode("utf-8")
    digest = hashlib.sha256(body).hexdigest()
    ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {r['url']}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"WARC-Refers-To: <urn:sha256:{digest}>\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8")
    return head + body + _CRLF + _CRLF


def build_warc_bytes(records: list[dict]) -> bytes:
    """Serialize response records to WARC/1.0 bytes (see
    ``build_warc_record``). Deterministic: records in list order, no
    UUIDs, no wall clock."""
    out = io.BytesIO()
    for r in records:
        out.write(build_warc_record(r))
    return out.getvalue()


# ------------------------------------------------------------------ parser

def _iter_warc_records(data: bytes, source: str = ""):
    """Shared record-framing walk over one WARC-family file's bytes:
    gzip sniff, header find/resync, field parse, Content-Length payload
    slice, trailing-CRLF skip. Yields (fields, payload) per record —
    the WARC/WET parsers differ only in what they extract from those.
    Malformed records are skipped or end the file, never fatal — at
    100k-file scale a poison record must not kill the ingest."""
    if source.endswith(".gz") or data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            # resync: skip to the next record marker
            nxt = data.find(b"WARC/1.", head_end)
            if nxt < 0:
                break
            pos = nxt
            continue
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break  # cannot locate the payload boundary; stop this file
        if length < 0:
            # adversarial/corrupt header: a negative length would move
            # pos BACKWARDS (infinite loop wedging the ingest task) —
            # treat as unframeable and stop this file
            break
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        yield fields, payload


def _parse_warc_ts(fields: dict):
    """WARC-Date as a NAIVE UTC datetime (the engine session runs
    spark.sql.session.timeZone = UTC, so naive objects land exactly;
    tz-aware objects would round-trip through Arrow's tz handling
    instead). None when missing/malformed."""
    try:
        return datetime.strptime(
            fields.get("warc-date", ""), "%Y-%m-%dT%H:%M:%SZ"
        )
    except ValueError:
        return None


def parse_warc_bytes(data: bytes, source: str = "") -> list[tuple]:
    """One WARC file's bytes → (url, warc_ts, http_status,
    content_type, html, warc_file) per ``response`` record.
    Non-response records (warcinfo, request, metadata) and malformed
    records are skipped, never fatal."""
    rows = []
    for fields, payload in _iter_warc_records(data, source):
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri")
        ts = _parse_warc_ts(fields)
        if ts is None:
            continue
        # split the HTTP head from the body
        http_end = payload.find(_CRLF + _CRLF)
        if http_end < 0 or not url:
            continue
        http_lines = payload[:http_end].decode("utf-8", "replace").split("\r\n")
        parts = http_lines[0].split(" ")
        try:
            status = int(parts[1])
        except (IndexError, ValueError):
            continue
        ctype = ""
        for ln in http_lines[1:]:
            k, _, v = ln.partition(":")
            if k.strip().lower() == "content-type":
                ctype = v.strip()
                break
        rows.append((url, ts, status, ctype, payload[http_end + 4 :], source))
    return rows


# ------------------------------------------------------------------ reader

def _read_archive(
    spark: SparkSession, path: str, parse_fn, columns: list, schema: str
) -> DataFrame:
    """Shared binaryFile → mapInPandas wrapper for the archive readers:
    one task per file, ``parse_fn(bytes, path)`` rows per record."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                out.extend(parse_fn(bytes(row["content"]), row["path"]))
            yield pd.DataFrame(out, columns=columns)

    return files.select("path", "content").mapInPandas(parse, schema)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame over every response record in the WARC files matched by
    ``path`` (glob ok; .warc and .warc.gz). Columns: url, warc_ts,
    http_status, content_type, html (body bytes), warc_file."""
    return _read_archive(
        spark, path, parse_warc_bytes,
        ["url", "warc_ts", "http_status", "content_type", "html",
         "warc_file"],
        WARC_SCHEMA,
    )


# ------------------------------------------------------------------ WET

WET_SCHEMA = "url string, warc_ts timestamp, text string, wet_file string"


def parse_wet_bytes(data: bytes, source: str = "") -> list[tuple]:
    """One WET file's bytes → (url, warc_ts, text, wet_file) per
    ``conversion`` record. The payload is the plain text itself (no
    HTTP envelope — that is what distinguishes WET from WARC). Other
    record types and malformed records are skipped, never fatal."""
    rows = []
    for fields, payload in _iter_warc_records(data, source):
        if fields.get("warc-type") != "conversion":
            continue
        url = fields.get("warc-target-uri")
        ts = _parse_warc_ts(fields)
        if ts is None or not url:
            continue
        rows.append((url, ts, payload.decode("utf-8", "replace"), source))
    return rows


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame over every conversion record in the WET files matched
    by ``path`` (glob ok; .wet/.warc.wet and gzipped). Columns: url,
    warc_ts, text, wet_file. Same scale posture as ``read_warc``: one
    binaryFile task per segment, parsing inside ``mapInPandas``."""
    return _read_archive(
        spark, path, parse_wet_bytes,
        ["url", "warc_ts", "text", "wet_file"],
        WET_SCHEMA,
    )
