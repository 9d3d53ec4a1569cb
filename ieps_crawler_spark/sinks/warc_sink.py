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
  bucket, segments clustered per task (repartition + segment-sorted
  ``mapInPandas`` streaming over Arrow batches), so writers never
  coordinate and the shuffle moves each page exactly once. 100 TB at
  ~1 GB/segment is ~100k buckets — the same segment granularity
  Common Crawl itself uses.
- The writer STREAMS: it holds one Arrow batch and one open file at a
  time (switching files on segment change), so task heap is O(batch)
  regardless of segment size; write-temp + atomic-rename commit with
  a task-attempt-unique temp name means a re-executed or speculative
  task can never leave a torn segment behind.
- Deterministic output: records sort by (url, warc_ts, md5(row)) —
  the content tiebreak covers equal-(url, ts) duplicates — the gzip
  header carries mtime=0, and record headers contain no UUIDs or wall
  clock, so re-running the sink on the same input yields
  byte-identical segments (asserted in tests), which is what makes
  archive diffs and resume audits possible at fleet scale.

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


def _task_attempt_tag() -> str:
    """Temp-name disambiguator unique across CONCURRENT attempts of the
    same work (speculative execution / retries on a shared out_dir):
    pids alone collide across executor hosts, taskAttemptId is unique
    application-wide."""
    try:
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None:
            return f"{tc.stageId()}-{tc.partitionId()}-{tc.taskAttemptId()}"
    except Exception:
        pass
    return f"pid{os.getpid()}"


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
    ``crc32(url) % n_segments`` bucketing JVM-side, segment-clustered
    sort, then ONE STREAMING pass per task (``mapInPandas`` over the
    sorted Arrow batches, switching output files on segment change).

    Memory: peak Python heap is O(one Arrow batch) — the earlier
    ``groupBy().applyInPandas`` shape materialized the WHOLE segment as
    one pandas frame first, so a ~1 GB segment needed multiple GB of
    task memory exactly at the design point; the streaming shape holds
    only the in-flight batch regardless of segment size.

    Determinism: rows sort by (segment, url, warc_ts, md5(full row)) —
    the md5 tiebreak makes even equal-(url, ts) duplicates with
    different payloads order identically run to run, so segment bytes
    are rerun-stable. Commit is write-temp + atomic rename per file
    with a task-attempt-unique temp name: concurrent attempts never
    share a temp file, and whichever attempt renames last installs the
    same deterministic bytes."""
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    os.makedirs(out_dir, exist_ok=True)
    width = max(5, len(str(n_segments - 1)))

    staged = (
        df.select(
            (F.crc32(F.col("url")) % n_segments).cast("int").alias("segment"),
            # full-row content tiebreak (binary -> base64 via to_json,
            # deterministic); null fields are omitted by to_json, which
            # is fine — omission is itself deterministic
            F.md5(F.to_json(F.struct(*cols))).alias("_tb"),
            *cols,
        )
        .repartition(n_segments, "segment")
        .sortWithinPartitions("segment", "url", "warc_ts", "_tb")
    )

    def write_stream(batches):
        # one open file at a time; a partition may carry several
        # segments (hash collision) — the sort keeps each contiguous
        attempt = _task_attempt_tag()
        manifests: list = []
        cur: list | None = None  # [seg, sink, raw, tmp, final, count]

        def close_cur():
            nonlocal cur
            if cur is None:
                return
            _, sink, raw, tmp, final, count = cur
            if gz:
                sink.close()
            raw.close()
            nbytes = os.path.getsize(tmp)
            os.replace(tmp, final)  # atomic on POSIX: retries can't tear
            manifests.append((final, count, nbytes))
            cur = None

        for pdf in batches:
            for r in pdf.itertuples():
                seg = int(r.segment)
                if cur is None or cur[0] != seg:
                    close_cur()
                    name = f"{prefix}-{seg:0{width}d}{ext}"
                    final = os.path.join(out_dir, name)
                    tmp = final + f".inprogress-{attempt}"
                    raw = open(tmp, "wb")
                    if gz:
                        # mtime=0 + filename="" keep the gzip header
                        # constant: over a NAMED file GzipFile would
                        # embed the temp name in the FNAME field,
                        # making bytes differ across workers/retries.
                        # Record-at-a-time feeding is chunking-
                        # invariant in zlib, so rerun bytes match.
                        sink = gzip.GzipFile(
                            filename="", fileobj=raw, mode="wb", mtime=0
                        )
                    else:
                        sink = raw
                    cur = [seg, sink, raw, tmp, final, 0]
                cur[1].write(to_record(r))
                cur[5] += 1
        close_cur()
        yield pd.DataFrame(
            manifests, columns=["warc_file", "records", "bytes"]
        )

    return staged.mapInPandas(write_stream, MANIFEST_SCHEMA)
