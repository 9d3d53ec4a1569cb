"""WARC sink connector (ISO 28500 — Common Crawl's native format).

Round-3 completion of the archive story: ``sources/warc.py`` ingests
WARC segments into the corpus shape; this module writes crawl output
BACK to segmented ``.warc`` / ``.warc.gz`` files, so the engine can
both start from and produce Common-Crawl-style archives:

    manifest = write_warc(fetched, "/data/out/segments", n_segments=64)

Reference parity note: the reference stores fetched pages in PostgreSQL
(db/Database.scala — the ``page.html_content`` column); archive export
does not exist there. This is the "Sinks" row of SURVEY §2.2 extended
to the format the north star's corpus actually ships in.

Scale posture (100 TB design):
- One WARC segment file per deterministic ``hash(url) % n_segments``
  bucket, one bucket per task (``groupBy(segment).applyInPandas``), so
  writers never coordinate and the shuffle moves each page exactly
  once. 100 TB at ~1 GB/segment is ~100k buckets — the same segment
  granularity Common Crawl itself uses.
- Bytes are assembled per-bucket inside Arrow batches (never
  per-row Python over rows crossing tasks) and streamed to ONE file
  per task with a write-temp + atomic-rename commit, so a re-executed
  task (Spark retry) can never leave a torn segment behind.
- Deterministic output: records sort by (url, warc_ts) inside a
  segment, the gzip header carries mtime=0, and record headers contain
  no UUIDs or wall clock — re-running the sink on the same input
  yields byte-identical segments (asserted in tests), which is what
  makes archive diffs and resume audits possible at fleet scale.

The sink returns a small manifest DataFrame (warc_file, records,
bytes) rather than writing one — callers append it to their own
lineage table (``sinks/tables.py`` keeps per-wave manifests already).
"""

from __future__ import annotations

import gzip
import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.warc import build_warc_bytes  # noqa: F401  (re-export)
from ..sources.warc import build_warc_record

MANIFEST_SCHEMA = "warc_file string, records bigint, bytes bigint"


def write_warc(
    df: DataFrame,
    out_dir: str,
    n_segments: int = 16,
    gz: bool = True,
    prefix: str = "segment",
) -> DataFrame:
    """Write (url, warc_ts, http_status, content_type, html) rows as
    ``n_segments`` WARC files under ``out_dir``; returns the manifest.

    The segment of a url is ``crc32(url) % n_segments`` computed
    JVM-side, so the only Python work is the per-bucket serialization.
    ``out_dir`` must be task-writable (local path or a mounted DFS);
    for object stores, point ``out_dir`` at a staging mount and commit
    the manifest to the catalog afterwards.
    """
    def to_record(r) -> bytes:
        return build_warc_record(
            {
                "url": r.url,
                "ts": r.warc_ts.to_pydatetime(),
                "status": int(r.http_status),
                "content_type": r.content_type or "",
                "body": bytes(r.html) if r.html is not None else b"",
            }
        )

    cols = ["url", "warc_ts", "http_status", "content_type", "html"]
    ext = ".warc.gz" if gz else ".warc"
    return _write_segments(
        df, cols, to_record, out_dir, n_segments, gz, prefix, ext
    )


def write_wet(
    df: DataFrame,
    out_dir: str,
    n_segments: int = 16,
    gz: bool = True,
    prefix: str = "segment",
) -> DataFrame:
    """Write (url, warc_ts, text) rows as ``n_segments`` WET files
    (Common Crawl's extracted-text sidecar: WARC ``conversion`` records,
    plain-UTF-8 payload, no HTTP envelope) under ``out_dir``; returns
    the same manifest shape as ``write_warc``. Together with
    ``write_warc`` and ``functions/surt.cdx_index`` this completes the
    Common Crawl archive trio (WARC / WET / CDX). Identical scale
    posture and byte-determinism contract as ``write_warc``."""
    from ..sources.warc import build_wet_record

    def to_record(r) -> bytes:
        return build_wet_record(
            {
                "url": r.url,
                "ts": r.warc_ts.to_pydatetime(),
                "text": r.text,
            }
        )

    ext = ".warc.wet.gz" if gz else ".warc.wet"
    return _write_segments(
        df, ["url", "warc_ts", "text"], to_record, out_dir, n_segments,
        gz, prefix, ext,
    )


def _write_segments(
    df: DataFrame,
    cols: list,
    to_record,
    out_dir: str,
    n_segments: int,
    gz: bool,
    prefix: str,
    ext: str,
) -> DataFrame:
    """Shared segment machinery for the archive sinks: deterministic
    ``crc32(url) % n_segments`` bucketing JVM-side, one file per bucket
    written record-at-a-time inside ``applyInPandas`` with a
    write-temp + atomic-rename commit."""
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    os.makedirs(out_dir, exist_ok=True)
    width = max(5, len(str(n_segments - 1)))

    staged = df.select(
        (F.crc32(F.col("url")) % n_segments).cast("int").alias("segment"),
        *cols,
    )

    def write_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment"].iloc[0])
        pdf = pdf.sort_values(["url", "warc_ts"], kind="mergesort")
        name = f"{prefix}-{seg:0{width}d}{ext}"
        final = os.path.join(out_dir, name)
        tmp = final + f".inprogress-{os.getpid()}"
        # Stream record-by-record through the (optionally gzip) file
        # handle: peak Python heap is O(one record), not O(segment) —
        # a ~1 GB segment must not need 3-4 GB of task memory.
        with open(tmp, "wb") as f:
            if gz:
                # mtime=0 + filename="" keep the gzip header constant:
                # over a NAMED file GzipFile would embed the temp name
                # (which carries the executor worker's pid) in the FNAME
                # field, making bytes differ across workers/retries.
                # Record-at-a-time feeding is chunking-invariant in
                # zlib, so rerun bytes still match.
                sink = gzip.GzipFile(
                    filename="", fileobj=f, mode="wb", mtime=0
                )
            else:
                sink = f
            for r in pdf.itertuples():
                sink.write(to_record(r))
            if gz:
                sink.close()
        nbytes = os.path.getsize(tmp)
        os.replace(tmp, final)  # atomic on POSIX: retries can't tear
        return pd.DataFrame(
            {"warc_file": [final], "records": [len(pdf)], "bytes": [nbytes]}
        )

    return staged.groupBy("segment").applyInPandas(
        write_segment, MANIFEST_SCHEMA
    )
