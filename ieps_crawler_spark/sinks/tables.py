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
            df.write.mode("overwrite").parquet(path)
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
    parquet scan. Mirrors Iceberg append commits."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def append(self, wave: int, name: str, df: DataFrame) -> None:
        final = os.path.join(self.root, name, f"wave={wave:06d}")
        staging = final + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        if os.path.exists(final):
            shutil.rmtree(final)
        df.write.mode("overwrite").parquet(staging)
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
        deltas and append-only state adds have different valid cutoffs."""
        for name in os.listdir(self.root):
            if tables is not None and name not in tables:
                continue
            base = os.path.join(self.root, name)
            for d in list(os.listdir(base)):
                w = d.split("=", 1)[1].split(".")[0]
                if d.endswith(".staging") or int(w) > wave:
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def _partition_rowcounts(path: str) -> list[dict]:
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".parquet"):
            out.append(
                {"file": f, "rows": pq.ParquetFile(os.path.join(path, f)).metadata.num_rows}
            )
    return out
