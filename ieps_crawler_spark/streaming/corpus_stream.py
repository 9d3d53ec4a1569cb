"""Streaming corpus ingestion — continuous document arrival (the
training-data twin of seed_stream's frontier feed): new text documents
land as JSON-lines files, each micro-batch is normalized
(operators/normalize.py), keyed by the sha-256 of the NORMALIZED text,
deduped within the batch AND against everything previously accepted,
and only first-seen documents append to the clean-corpus directory.

Why normalize before hashing: an un-normalized corpus stream admits the
same article twice when one feed emits NFC text and another emits
combining marks (the exact failure operators/normalize.py exists to
close) — the hash key must be post-normalization or streaming dedup
silently leaks duplicates batch over batch.

Shape: ``foreachBatch`` (same rationale as seed_stream.py): cross-batch
state is the accepted-corpus directory itself, probed with the SAME
batch operator the crawl uses (operators/seen.dedup_against_seen with
``url_col="content_hash"``), and the state is a plain parquet table
any batch job can read with no translation layer.

Stream/batch equivalence contract (tested): the accepted CONTENT-HASH
set is identical however the files are batched — one micro-batch, one
file per trigger, or a single static read. The representative ROW per
hash differs by design: a stream keeps the url accepted in the
EARLIEST batch that carried the content (later arrivals anti-join
away; state is append-only), while a one-shot batch read picks the
lexicographically smallest url across all files. Both choices are
deterministic for a given batching; only the hash set is
batching-invariant.

Within-batch dedup is a deterministic struct-min first-wins (smallest
url per hash), never dropDuplicates: drop-order varies with partition
layout across cluster sizes, and an ingest whose accepted set depends
on parallelism cannot be replayed or audited.

Delivery contract: effectively exactly-once (ADVICE r3). foreachBatch
is at-least-once, so each batch writes its OWN partition directory
(``batch_id=N``) with overwrite semantics: a batch replayed after a
crash between write and offset-commit rewrites the same directory
instead of appending a second copy. The replay-visibility subtlety:
the "previously accepted" anti-join set must EXCLUDE the current
batch's own partition — a half-written batch_id=N from the crashed
attempt would otherwise mark its own rows as already-seen and the
overwrite would erase them. Readers see a normal parquet table with an
extra ``batch_id`` partition column (partition discovery), no
group-by-content_hash collapse needed.

Scale posture per batch: one Arrow NFC stage, one hash aggregate
(struct-min), one anti-join against the accepted table (bloom-routable
via the same seen.py machinery when the accepted set outgrows the
shuffle); the accepted table is append-only parquet, O(new docs) per
batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.normalize import normalize_text
from ..operators.seen import dedup_against_seen

__all__ = [
    "DOC_STREAM_SCHEMA",
    "document_stream",
    "prepare_documents",
    "run_corpus_ingest",
]

# JSON-lines document feed shape (url/text/lang mirror the corpus
# input_hint columns a crawl or export produces)
DOC_STREAM_SCHEMA = "url string, text string, lang string"


def document_stream(
    spark: SparkSession,
    docs_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of JSON-lines documents."""
    r = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.json(docs_dir)


def prepare_documents(docs: DataFrame, fix_mojibake: bool = False) -> DataFrame:
    """Raw documents → (url, text, lang, norm_text, content_hash) with
    blank/null text dropped and within-frame duplicates collapsed to
    the lexicographically-smallest url per normalized-content hash
    (deterministic first-wins — no partition-order dependence). Works
    on a static OR streaming-batch frame; the single shared definition
    is what makes the stream/batch equivalence test meaningful."""
    normed = (
        docs.filter(F.col("url").isNotNull())
        .withColumn("url", F.trim(F.col("url")))
        .filter(F.length("url") > 0)
        .transform(lambda d: normalize_text(d, fix_mojibake=fix_mojibake))
        .filter(
            F.col("norm_text").isNotNull() & (F.length("norm_text") > 0)
        )
        .withColumn("content_hash", F.upper(F.sha2(F.col("norm_text"), 256)))
    )
    # struct-min first-wins: one hash aggregate, no window
    return (
        normed.groupBy("content_hash")
        .agg(
            F.min(
                F.struct("url", "text", "lang", "norm_text")
            ).alias("_w")
        )
        .select(
            F.col("_w.url").alias("url"),
            F.col("_w.text").alias("text"),
            F.col("_w.lang").alias("lang"),
            F.col("_w.norm_text").alias("norm_text"),
            "content_hash",
        )
    )


def _corpus_batch_partitions(corpus_dir: str) -> list:
    """batch_id= partition directory names under corpus_dir ([] when
    the dir is absent — local-fs probe, same pattern as plans/crawl)."""
    if not os.path.isdir(corpus_dir):
        return []
    return [
        n for n in os.listdir(corpus_dir) if n.startswith("batch_id=")
    ]


def run_corpus_ingest(
    spark: SparkSession,
    docs_dir: str,
    corpus_dir: str,
    ckpt_dir: str,
    max_files_per_trigger: int | None = None,
    fix_mojibake: bool = False,
) -> None:
    """Bounded ingest run: drain every unprocessed document file,
    append the never-seen (by normalized-content hash) documents to
    ``corpus_dir``, then stop. Re-running after new files land
    processes ONLY the new files (checkpointed file-source offsets) and
    appends only content absent from the accumulated corpus. Each batch
    owns partition ``corpus_dir/batch_id=N`` (overwrite): replays after
    a crash rewrite, never duplicate (module docstring, delivery
    contract).

    The overwrite-partition contract is scoped to SAME-CHECKPOINT
    replays (ADVICE r4): batch ordinals restart at 0 when the
    checkpoint is lost, and with drifted source-file composition (new
    files landed, trigger boundaries shifted, old files retired) the
    new batch 0 would overwrite the old ``batch_id=0`` partition with
    DIFFERENT content — silently destroying previously accepted rows
    whose source files are gone. So a populated corpus_dir with NO
    streaming checkpoint refuses to start; recover by pointing the
    re-ingest at a fresh corpus_dir and merging offline, or by
    restoring the checkpoint."""
    if _corpus_batch_partitions(corpus_dir) and not os.path.isdir(
        os.path.join(ckpt_dir, "offsets")
    ):
        raise ValueError(
            f"corpus_dir {corpus_dir!r} already holds batch_id= "
            f"partitions but streaming checkpoint {ckpt_dir!r} has no "
            "committed offsets: restarting from batch 0 would overwrite "
            "previously accepted partitions with different content. "
            "Restore the checkpoint, or ingest into a fresh corpus_dir "
            "and merge."
        )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        cand = prepare_documents(batch_df, fix_mojibake=fix_mojibake)
        sess = batch_df.sparkSession
        # explicit existence probe (matching plans/crawl.py's
        # os.path.isdir pattern) instead of a broad AnalysisException
        # catch (ADVICE r4): a corpus_dir in the legacy flat-append
        # layout (or any other malformed state) now fails LOUDLY at the
        # read/filter below rather than silently skipping the
        # cross-batch anti-join and admitting duplicates.
        if os.path.isdir(corpus_dir) and os.listdir(corpus_dir):
            # exclude THIS batch's partition: on a replay the crashed
            # attempt's rows must not anti-join the batch against
            # itself (they are about to be overwritten)
            accepted = (
                sess.read.parquet(corpus_dir)
                .filter(F.col("batch_id") != F.lit(batch_id))
                .select("content_hash")
            )
            fresh = dedup_against_seen(
                cand, accepted, url_col="content_hash"
            )
        else:  # first batch: no corpus yet
            fresh = cand
        fresh.write.mode("overwrite").parquet(
            f"{corpus_dir}/batch_id={batch_id}"
        )

    q = (
        document_stream(spark, docs_dir, max_files_per_trigger)
        .writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
