"""Streaming seed ingestion — the frontier-feed half of the streaming
plane (the monitoring half lives in metrics_stream.py).

A 10^10-URL crawl doesn't receive its seeds as one list; they arrive
continuously (sitemap pings, submission APIs, link feeds dropped by
other systems). This watches a directory of seed files (one URL per
line), canonicalizes each line with the SAME quirk-transcribed
canonicalizer the crawl waves use (functions/canon.py), and appends
only never-before-seen URLs to a frontier parquet directory.

Shape: ``foreachBatch``, deliberately. The cross-batch dedup is an
anti-join against state that grows with the stream; expressing it as
streaming ``dropDuplicates`` would rebuild that state inside the
engine's state store (unbounded, not shareable with the batch crawl),
while foreachBatch reuses the exact batch operator
(operators/seen.dedup_against_seen) with the on-disk frontier AS the
state — streaming and batch ingestion stay byte-identical (proven by
the equivalence test), and the crawl can consume the frontier directory
with no translation layer.

Delivery contract: the checkpoint gives at-least-once foreachBatch
execution; a batch replayed after a crash between write and commit can
append its rows twice. Consumers that need exactly-once read through
``dedup_against_seen`` anyway (the crawl does), which collapses such
replays; for standalone use, dropDuplicates(canon_url) downstream
restores set semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..functions.canon import canonicalize_udf, extract_domain_udf
from ..operators.seen import dedup_against_seen

__all__ = ["seed_lines_stream", "canonicalize_seed_lines", "run_seed_ingest"]


def seed_lines_stream(
    spark: SparkSession, seeds_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of raw seed lines (column ``value``)."""
    r = spark.readStream
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.text(seeds_dir)


def canonicalize_seed_lines(lines: DataFrame) -> DataFrame:
    """Raw lines → (canon_url, host), blank/invalid lines dropped,
    within-frame duplicates collapsed. Works on a static OR streaming
    frame — the single definition both paths share is what makes the
    stream/batch equivalence test meaningful."""
    return (
        lines.select(F.trim(F.col("value")).alias("url"))
        .filter(F.length("url") > 0)
        .withColumn("canon_url", canonicalize_udf("url"))
        .filter(F.col("canon_url").isNotNull())
        .select(
            "canon_url", extract_domain_udf("canon_url").alias("host")
        )
        .dropDuplicates(["canon_url"])
    )


def run_seed_ingest(
    spark: SparkSession,
    seeds_dir: str,
    frontier_dir: str,
    ckpt_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Bounded ingest run: drain every unprocessed seed file, append the
    never-seen URLs to ``frontier_dir``, then stop. Re-running after new
    files land processes ONLY the new files (checkpointed file-source
    offsets) and appends only URLs absent from the accumulated frontier."""

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        cand = canonicalize_seed_lines(batch_df)
        try:
            seen = batch_df.sparkSession.read.parquet(frontier_dir).select(
                "canon_url"
            )
        except AnalysisException:  # first batch: no frontier yet
            fresh = cand
        else:
            fresh = dedup_against_seen(cand, seen)
        fresh.write.mode("append").parquet(frontier_dir)

    q = (
        seed_lines_stream(spark, seeds_dir, max_files_per_trigger)
        .writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
