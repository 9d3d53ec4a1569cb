"""Streaming corpus ingestion (streaming/corpus_stream.py): stream ==
batch equivalence, cross-batch dedup on the NORMALIZED content hash,
incremental file-offset checkpointing."""

import json
import os

from pyspark.sql import functions as F

from ieps_crawler_spark.streaming.corpus_stream import (
    DOC_STREAM_SCHEMA,
    prepare_documents,
    run_corpus_ingest,
)

E_ACUTE = "\u00e9"
COMBINING = "e\u0301"


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")


def _docs(n, prefix, text_of):
    return [
        {"url": f"http://{prefix}.si/{i}", "text": text_of(i), "lang": "sl"}
        for i in range(n)
    ]


def test_stream_equals_batch_and_dedups_across_batches(spark, tmp_path):
    docs_dir = str(tmp_path / "feed")
    corpus_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ck")

    # file 1: 5 docs; file 2: same CONTENT under new urls, spelled with
    # combining marks (normalization must collapse them), plus 2 new
    _write_jsonl(
        os.path.join(docs_dir, "a.jsonl"),
        _docs(5, "a", lambda i: f"Caf{E_ACUTE} doc {i}"),
    )
    _write_jsonl(
        os.path.join(docs_dir, "b.jsonl"),
        _docs(5, "b", lambda i: f"Caf{COMBINING} doc {i}")
        + _docs(2, "new", lambda i: f"fresh {i}"),
    )
    run_corpus_ingest(spark, docs_dir, corpus_dir, ckpt)

    got = spark.read.parquet(corpus_dir)
    # batch twin over ALL files at once
    batch = prepare_documents(
        spark.read.schema(DOC_STREAM_SCHEMA).json(docs_dir)
    )
    want = {r.content_hash: r.url for r in batch.collect()}
    got_m = {r.content_hash: r.url for r in got.collect()}
    assert got_m == want
    assert got.count() == 7  # 5 contents + 2 fresh; NFC twins collapsed

    # incremental: a third file with 1 dup-of-batch-1 + 1 new doc
    _write_jsonl(
        os.path.join(docs_dir, "c.jsonl"),
        [{"url": "http://c.si/0", "text": f"Caf{E_ACUTE} doc 0",
          "lang": "sl"},
         {"url": "http://c.si/1", "text": "brand new", "lang": "sl"}],
    )
    run_corpus_ingest(spark, docs_dir, corpus_dir, ckpt)
    after = spark.read.parquet(corpus_dir)
    assert after.count() == 8  # only the genuinely-new doc appended
    assert after.filter(F.col("url") == "http://c.si/1").count() == 1
    assert after.filter(F.col("url") == "http://c.si/0").count() == 0


def test_prepare_documents_deterministic_first_wins(spark):
    rows = [
        ("http://z.si/1", "same text", "sl"),
        ("http://a.si/1", "same  text", "sl"),   # whitespace-folds equal
        ("http://m.si/1", "same text", "sl"),
        ("http://x.si/1", "", "sl"),             # blank -> dropped
        ("http://y.si/1", None, "sl"),           # null -> dropped
        (None, "orphan", "sl"),                  # null url -> dropped
    ]
    df = spark.createDataFrame(rows, DOC_STREAM_SCHEMA)
    out = prepare_documents(df).collect()
    assert len(out) == 1
    # lexicographically smallest url wins, independent of input order
    assert out[0].url == "http://a.si/1"
    assert out[0].norm_text == "same text"


def test_one_file_per_trigger_cross_batch_nfc_dedup(spark, tmp_path):
    """Force one file per micro-batch so the NFC-twin collapse happens
    via the anti-join against the ACCEPTED corpus (the cross-batch
    path), not within-batch struct-min; the accepted content-hash set
    must equal the single-batch run's, with the EARLIEST batch's url
    kept per hash."""
    docs_dir = str(tmp_path / "feed")
    corpus_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ck")

    # file 0 must sort first by name so its urls are the earliest batch;
    # its urls sort lexicographically LARGER (z>a) to prove the stream
    # keeps earliest-batch urls, not smallest urls
    _write_jsonl(
        os.path.join(docs_dir, "0.jsonl"),
        _docs(3, "z", lambda i: f"Caf{E_ACUTE} doc {i}"),
    )
    _write_jsonl(
        os.path.join(docs_dir, "1.jsonl"),
        _docs(3, "a", lambda i: f"Caf{COMBINING} doc {i}")
        + _docs(1, "extra", lambda i: f"only here {i}"),
    )
    # the file source orders by modification time: pin 0.jsonl older so
    # the batch order is deterministic regardless of FS timestamp
    # granularity
    now = os.path.getmtime(os.path.join(docs_dir, "1.jsonl"))
    os.utime(os.path.join(docs_dir, "0.jsonl"), (now - 10, now - 10))
    run_corpus_ingest(spark, docs_dir, corpus_dir, ckpt,
                      max_files_per_trigger=1)
    got = spark.read.parquet(corpus_dir)
    assert got.count() == 4  # 3 contents (twins collapsed) + 1 extra

    batch = prepare_documents(
        spark.read.schema(DOC_STREAM_SCHEMA).json(docs_dir)
    )
    # batching-invariant: the accepted content-hash set
    assert ({r.content_hash for r in got.collect()}
            == {r.content_hash for r in batch.collect()})
    # stream representative = earliest batch's url (z.si), even though
    # the one-shot batch read would pick the smaller a.si urls
    urls = {r.url for r in got.collect()}
    assert all(u.startswith(("http://z.si/", "http://extra.si/"))
               for u in urls), urls
    assert {r.url for r in batch.collect()} != urls


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """ADVICE r3+r4: a batch replayed after a crash between the corpus
    write and the offset commit must not duplicate rows. Faithful
    simulation: SAME checkpoint, with the batch's commit marker removed
    (exactly the crash window) — the source replays batch 0 under the
    same batch_id and the batch_id=0 partition is overwritten in
    place, byte-stable."""
    docs_dir = str(tmp_path / "feed")
    corpus_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ck1")

    _write_jsonl(
        os.path.join(docs_dir, "a.jsonl"),
        _docs(5, "a", lambda i: f"doc number {i}"),
    )
    run_corpus_ingest(spark, docs_dir, corpus_dir, ckpt)
    first = sorted(
        (r.content_hash, r.url)
        for r in spark.read.parquet(corpus_dir).collect()
    )
    assert len(first) == 5
    # crash window: foreachBatch wrote the partition but the commit
    # marker never landed -> restart replays batch 0, same checkpoint
    # (the .crc twin must go too or Hadoop's rename-into-place fails)
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_corpus_ingest(spark, docs_dir, corpus_dir, ckpt)
    again = sorted(
        (r.content_hash, r.url)
        for r in spark.read.parquet(corpus_dir).collect()
    )
    assert again == first  # no duplicate append, no loss
    # per-batch ownership is visible as a partition column
    assert "batch_id" in spark.read.parquet(corpus_dir).columns


def test_populated_corpus_without_checkpoint_refuses(spark, tmp_path):
    """ADVICE r4: batch ordinals restart at 0 when the checkpoint is
    lost; with drifted file composition the new batch 0 would overwrite
    the old batch_id=0 partition with different content. A populated
    corpus_dir + absent checkpoint must refuse to start instead of
    silently destroying accepted rows."""
    import pytest

    docs_dir = str(tmp_path / "feed")
    corpus_dir = str(tmp_path / "corpus")

    _write_jsonl(
        os.path.join(docs_dir, "a.jsonl"),
        _docs(3, "a", lambda i: f"doc number {i}"),
    )
    run_corpus_ingest(spark, docs_dir, corpus_dir, str(tmp_path / "ck1"))
    assert spark.read.parquet(corpus_dir).count() == 3
    # drifted feed + lost checkpoint: batch 0 would carry different rows
    _write_jsonl(
        os.path.join(docs_dir, "b.jsonl"),
        _docs(2, "b", lambda i: f"other doc {i}"),
    )
    with pytest.raises(ValueError, match="checkpoint"):
        run_corpus_ingest(
            spark, docs_dir, corpus_dir, str(tmp_path / "ck-lost")
        )
    # nothing was destroyed by the refused run
    assert spark.read.parquet(corpus_dir).count() == 3
