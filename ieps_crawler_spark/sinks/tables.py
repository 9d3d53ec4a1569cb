"""Snapshot-table layer — parquet-backed, Iceberg-style atomic per-wave
commits (SURVEY §1.4 / O26).

The reference commits crawl state transactionally to PostgreSQL
(CrawlerDIO.scala:54,77,86) and flushes its BigQueue every 1000 ops
(queue/Queue.scala:10). The Spark engine replaces both with one atomic
snapshot per wave: every state table (frontier, seen, seen_hashes,
known_hosts) plus the per-wave deltas (crawl_results, links, metrics,
lineage) are written under a staging directory and committed with a
single atomic ``os.rename`` to ``wave=NNNNNN`` + a manifest. Resume =
highest wave directory containing a manifest (torn writes are invisible
because rename is atomic).

On a cluster with an Iceberg catalog this maps 1:1 to Iceberg snapshot
commits (``df.writeTo(tbl).overwritePartitions()``); the parquet layout
keeps the same semantics without requiring catalog jars in the sandbox.

Per-partition lineage (north_rule): each snapshot records, per state
table, the partition row counts captured at write time — enough to audit
which partition produced/dropped rows between waves.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------------- paths
    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave={wave:06d}")

    def latest_wave(self) -> int | None:
        """Highest committed wave (manifest present), else None."""
        best = None
        if not os.path.isdir(self.root):
            return None
        for d in os.listdir(self.root):
            if d.startswith("wave=") and os.path.exists(
                os.path.join(self.root, d, MANIFEST)
            ):
                w = int(d.split("=", 1)[1])
                best = w if best is None or w > best else best
        return best

    def clear(self) -> None:
        """Drop every snapshot (fresh-start over a reused checkpoint dir).
        Without this, stale wave=N dirs from a previous crawl survive —
        and since _gc keeps the highest-numbered snapshots, they would
        shadow the new crawl's low-numbered ones and a later resume would
        silently pick the OLD crawl's frontier."""
        for d in list(os.listdir(self.root)):
            if d.startswith("wave="):
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)

    # --------------------------------------------------------------- commit
    def commit_wave(
        self,
        wave: int,
        tables: dict[str, DataFrame],
        extra_meta: dict | None = None,
        ordered: tuple[str, ...] = (),
    ) -> dict:
        """Atomically write all state tables for `wave`. Returns manifest.

        ``ordered`` names are written first, sequentially — use it for the
        table whose write materializes a cache the other tables read
        (concurrent jobs racing on an unmaterialized cache each recompute
        the full lineage; sequencing the producer makes the rest cheap)."""
        final = self._wave_dir(wave)
        staging = final + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(staging)
        lineage = {}
        # independent table writes run as concurrent Spark jobs (threads
        # share the scheduler) — wall time is the slowest write, not the sum
        from concurrent.futures import ThreadPoolExecutor

        def _write(item):
            name, df = item
            path = os.path.join(staging, name)
            _sized_write(df, path)
            # per-partition lineage: parquet part-file row counts
            return name, _partition_rowcounts(path)

        for name in ordered:
            if name in tables:
                n, counts = _write((name, tables[name]))
                lineage[n] = counts
        rest = [(n, df) for n, df in tables.items() if n not in ordered]
        if rest:
            with ThreadPoolExecutor(max_workers=len(rest)) as ex:
                for name, counts in ex.map(_write, rest):
                    lineage[name] = counts
        manifest = {
            "wave": wave,
            "committed_at": time.time(),
            "tables": sorted(tables),
            "lineage": lineage,
            **(extra_meta or {}),
        }
        with open(os.path.join(staging, MANIFEST), "w") as f:
            json.dump(manifest, f)
        os.rename(staging, final)  # atomic commit
        self._gc(keep_latest=2, current=wave)
        return manifest

    def _gc(self, keep_latest: int, current: int) -> None:
        """Drop old wave snapshots, keeping the newest `keep_latest`
        (frontier/seen state is fully contained in each snapshot; deltas
        live under delta_dir and are never GC'd)."""
        waves = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.root)
            if d.startswith("wave=") and not d.endswith(".staging")
        )
        for w in waves[:-keep_latest]:
            if w != current:
                shutil.rmtree(self._wave_dir(w), ignore_errors=True)

    # ----------------------------------------------------------------- read
    def read(self, spark: SparkSession, wave: int, name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._wave_dir(wave), name))

    def manifest(self, wave: int) -> dict:
        with open(os.path.join(self._wave_dir(wave), MANIFEST)) as f:
            return json.load(f)


class DeltaLog:
    """Append-only per-wave deltas (crawl_results, links, metrics): each
    wave writes its own subdirectory; a full-table read is one recursive
    parquet scan. Mirrors Iceberg append commits.

    Compaction (VERDICT r1 #8): the seen/hashes/hosts add-sets are read
    EVERY wave, so directory count — and with it parquet footer/listing
    cost — grows linearly in waves. ``compact`` folds all committed add
    directories into one ``compact=<lo>-<hi>`` directory (Iceberg's
    rewrite_data_files equivalent). Crash safety: the combined directory
    is staged + atomically renamed BEFORE sources are deleted, so the
    only crash anomaly is sources surviving next to their compact dir
    (transient duplicates); ``finish_compactions`` — called on resume
    before any read — deletes every source a compact dir covers."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @staticmethod
    def _dir_range(d: str) -> tuple[int, int] | None:
        """(lo, hi) wave range covered by a delta directory name."""
        if d.endswith(".staging"):
            return None
        if d.startswith("wave="):
            w = int(d.split("=", 1)[1])
            return (w, w)
        if d.startswith("compact="):
            lo, hi = d.split("=", 1)[1].split("-")
            return (int(lo), int(hi))
        return None

    def compact(
        self, spark: SparkSession, name: str, upto_wave: int, min_dirs: int = 4
    ) -> bool:
        """Fold every delta dir of ``name`` covering waves <= upto_wave
        into one compact dir. Callers must only pass committed waves
        (adds[k] belong to snapshot k): a compact dir is all-or-nothing
        under resume truncation. Returns True if a rewrite happened."""
        base = os.path.join(self.root, name)
        if not os.path.isdir(base):
            return False
        sources = []
        for d in sorted(os.listdir(base)):
            r = self._dir_range(d)
            if r is not None and r[1] <= upto_wave:
                sources.append((d, r))
        if len(sources) < min_dirs:
            return False
        lo = min(r[0] for _, r in sources)
        hi = max(r[1] for _, r in sources)
        final = os.path.join(base, f"compact={lo:06d}-{hi:06d}")
        staging = final + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        df = spark.read.parquet(*[os.path.join(base, d) for d, _ in sources])
        # small-file packing falls out of the scan (maxPartitionBytes bins
        # many small inputs per partition), so the rewrite shrinks both
        # directory count and file count without an explicit shuffle
        df.write.mode("overwrite").parquet(staging)
        os.rename(staging, final)
        for d, _ in sources:
            if d != os.path.basename(final):
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
        return True

    def finish_compactions(self, tables: tuple[str, ...]) -> None:
        """Crash cleanup: drop staging leftovers and any source dir a
        committed compact dir covers. Must run before reads on resume."""
        for name in tables:
            base = os.path.join(self.root, name)
            if not os.path.isdir(base):
                continue
            dirs = os.listdir(base)
            compacts = []
            for d in dirs:
                if d.endswith(".staging"):
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
                elif d.startswith("compact="):
                    compacts.append((d, self._dir_range(d)))
            for d in dirs:
                r = self._dir_range(d)
                if r is None:
                    continue
                for cd, cr in compacts:
                    if d != cd and cr[0] <= r[0] and r[1] <= cr[1]:
                        shutil.rmtree(os.path.join(base, d), ignore_errors=True)
                        break

    def append(self, wave: int, name: str, df: DataFrame) -> None:
        final = os.path.join(self.root, name, f"wave={wave:06d}")
        staging = final + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        if os.path.exists(final):
            shutil.rmtree(final)
        _sized_write(df, staging)
        os.rename(staging, final)

    def append_local(self, wave: int, name: str, rows: list[dict]) -> None:
        """Driver-side append for tiny control-plane rows (wave metrics):
        same directory layout and atomic rename as ``append``, but written
        with pyarrow directly — no Spark job for a 1-row table."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        final = os.path.join(self.root, name, f"wave={wave:06d}")
        staging = final + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(staging)
        pq.write_table(
            pa.Table.from_pylist(rows), os.path.join(staging, "part-00000.parquet")
        )
        os.rename(staging, final)

    def read_wave(self, spark: SparkSession, name: str, wave: int) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, name, f"wave={wave:06d}"))

    def read_all(self, spark: SparkSession, name: str) -> DataFrame | None:
        base = os.path.join(self.root, name)
        if not os.path.isdir(base) or not os.listdir(base):
            return None
        dirs = [
            os.path.join(base, d)
            for d in sorted(os.listdir(base))
            if not d.endswith(".staging")
        ]
        return spark.read.parquet(*dirs)

    def truncate_after(self, wave: int, tables: tuple[str, ...] | None = None) -> None:
        """Resume support: drop deltas newer than `wave` (uncommitted).
        ``tables`` limits the cut to the named delta tables — per-wave
        deltas and append-only state adds have different valid cutoffs.
        Compact dirs are all-or-nothing: ``compact`` only ever covers
        committed waves, so a compact range can never straddle a valid
        resume cutoff; one that ends past the cutoff is dropped whole."""
        for name in os.listdir(self.root):
            if tables is not None and name not in tables:
                continue
            base = os.path.join(self.root, name)
            for d in list(os.listdir(base)):
                r = self._dir_range(d)
                if r is None or r[1] > wave:
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def _sized_write(df: DataFrame, path: str) -> None:
    """Write with an AQE REBALANCE shuffle in front: Spark sizes the
    output files to the advisory partition size (~64 MB) instead of
    emitting one file per upstream task — a toy wave writes ONE file
    where it wrote 64 four-KB ones (each parquet commit is a fixed
    filesystem round-trip, so tiny-file counts turn IO-latency jitter
    into wave-time jitter), and a 10^7-row wave still writes tens of
    right-sized files in parallel. This is Iceberg's
    write.distribution-mode shuffle; upstream stages (extraction,
    dedup) keep full parallelism — only the final narrow write stage
    re-buckets. Falls back to a plain write for non-AQE sessions
    (ResolveCoalesceHints only recognizes REBALANCE under AQE, so the
    hint would be dropped with a warning there anyway)."""
    try:
        aqe = (
            df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true").lower()
            == "true"
        )
        (df.hint("rebalance") if aqe else df).write.mode("overwrite").parquet(path)
    except Exception:
        df.write.mode("overwrite").parquet(path)


def _partition_rowcounts(path: str) -> list[dict]:
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".parquet"):
            out.append(
                {"file": f, "rows": pq.ParquetFile(os.path.join(path, f)).metadata.num_rows}
            )
    return out
