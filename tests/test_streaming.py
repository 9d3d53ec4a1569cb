"""Structured Streaming surface: actually RUN the streaming queries
(round-1 only oracle-checked their batch twins).

- crawl_metrics_stream: file-source stream over a crawl_results delta
  log, bounded with trigger(availableNow) — output must equal the batch
  groupBy over the same files.
- sessionize_events: applyInPandasWithState pipeline must execute end to
  end (state schema/timeout plumbing); with processing-time timeouts a
  single bounded pass stores state and emits nothing — asserted, since
  that IS the contract append-mode sessions have before timeout fires.
"""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def results_dir(spark, tmp_path_factory):
    """A tiny crawl to produce a real crawl_results delta log."""
    from ieps_crawler_spark.corpus import generate_corpus
    from ieps_crawler_spark.plans.crawl import Crawler

    corpus = generate_corpus(80, seed=42)
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()}
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    c = Crawler(spark, pages, sites, bodies, ckpt, wave_seconds=60)
    c.run(seeds=corpus["seeds"], max_waves=3)
    return os.path.join(ckpt, "deltas", "crawl_results")


def test_metrics_stream_equals_batch(spark, results_dir, tmp_path):
    from ieps_crawler_spark.streaming.metrics_stream import run_metrics_batch

    # batch twin over the original log BEFORE the sentinel lands
    batch = (
        spark.read.option("recursiveFileLookup", "true").parquet(results_dir)
        .groupBy(F.window("sched_ts", "1 minute").alias("w"), "page_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "page_type", "n")
    )
    want = {
        (r["window_start"], r["page_type"]): r["n"] for r in batch.collect()
    }

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    # pass 1: ingests everything; append-mode windows stay pending until
    # the watermark passes them
    run_metrics_batch(spark, results_dir, out, ck)
    # sentinel far in the future advances the watermark past every real
    # window; pass 2 (same checkpoint) then emits them all
    sentinel = spark.read.option("recursiveFileLookup", "true").parquet(
        results_dir
    ).limit(1).withColumn(
        "sched_ts", F.col("sched_ts") + F.expr("INTERVAL 1 DAY")
    ).withColumn("page_type", F.lit("SENTINEL"))
    sentinel.write.mode("overwrite").parquet(
        os.path.join(results_dir, "wave=000099")
    )
    run_metrics_batch(spark, results_dir, out, ck)

    got = {
        (r["window_start"], r["page_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
        if r["page_type"] != "SENTINEL"
    }
    assert got == want
    assert len(got) > 0


def test_sessionize_out_of_order_across_batches(spark, tmp_path):
    """A later micro-batch delivering an event BEFORE the stored open
    session must not fold it into that session (the pre-review fold
    produced a session whose start postdated one of its events). With
    interval merging it forms its own correctly-bounded session."""
    from ieps_crawler_spark.streaming.metrics_stream import sessionize_events

    src = str(tmp_path / "src")
    base = "2024-01-01 00:00:00"
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def write(part, rows):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            os.path.join(src, part)
        )

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    # after this batch: session [t0] emitted (gap 40 > 30), open = [t+40];
    # watermark = t+10
    write("p0", [(1, t0, 7, "a", 1.0), (2, t0 + 40 * m, 7, "a", 2.0)])

    def run_pass():
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        q = (
            sessionize_events(stream)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert not q.isActive

    run_pass()
    # within-watermark straggler (t+20 > watermark t+10) BEFORE the open
    # session's start t+40: must EXTEND the open interval to [t+20, t+40]
    # — the pre-review fold kept start=t+40 while absorbing the event
    write("p1", [(3, t0 + 20 * m, 7, "a", 4.0)])
    run_pass()
    # sentinel flushes the open tail
    write("p2", [(9, t0 + dt.timedelta(days=10), -1, "a", 0.0)])
    run_pass()

    rows = sorted(
        (
            (r["session_start"], r["session_end"], r["n_events"], r["total_value"])
            for r in spark.read.parquet(str(tmp_path / "out")).filter(
                F.col("user_id") == 7
            ).collect()
        )
    )
    assert rows == [
        (t0, t0, 1, 1.0),
        (t0 + 20 * m, t0 + 40 * m, 2, 6.0),
    ]


def _batch_sessions(pdf, gap_us=30 * 60 * 1_000_000):
    """Pure-pandas twin of the 30-min-gap sessionization."""
    out = {}
    pdf = pdf.copy()
    pdf["us"] = pdf["ts"].astype("int64") // 1000
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("us", kind="stable")
        cur = None
        sessions = []
        for t, v in zip(g["us"], g["value"]):
            if cur is not None and t - cur[1] > gap_us:
                sessions.append(cur)
                cur = None
            if cur is None:
                cur = [int(t), int(t), 1, float(v)]
            else:
                cur[1] = max(cur[1], int(t))
                cur[2] += 1
                cur[3] += float(v)
        if cur is not None:
            sessions.append(cur)
        for s in sessions:
            out[(uid, s[0])] = (s[1], s[2], round(s[3], 4))
    return out


def test_sessionize_stream_equals_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState event-time sessions must equal the batch
    gap-split twin once a watermark-advancing sentinel flushes the open
    tails."""
    from ieps_crawler_spark.streaming.metrics_stream import sessionize_events

    src = str(tmp_path / "events_src")
    # watermarks require TIMESTAMP (with tz); the fixture is NTZ
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .limit(2000)
    )
    ev.write.mode("overwrite").parquet(os.path.join(src, "part0"))
    schema = ev.schema

    def run_pass():
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        q = (
            sessionize_events(stream)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sess_out"))
            .option("checkpointLocation", str(tmp_path / "sess_ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert not q.isActive, "bounded sessionize run did not terminate"

    run_pass()
    # sentinel event far in the future for a reserved user advances the
    # watermark; the follow-up pass fires the event-time timeouts that
    # flush every real user's open session
    sentinel = (
        ev.groupBy()
        .agg(F.max("ts").alias("mx"))
        .join(ev.limit(1))
        .withColumn("user_id", F.lit(-1).cast("long"))
        .withColumn("ts", F.col("mx") + F.expr("INTERVAL 10 DAYS"))
        .drop("mx")
        .select(*ev.columns)
    )
    sentinel.write.mode("overwrite").parquet(os.path.join(src, "part1"))
    run_pass()

    got_rows = spark.read.parquet(str(tmp_path / "sess_out")).filter(
        F.col("user_id") >= 0
    ).collect()
    got = {
        (r["user_id"], int(r["session_start"].timestamp() * 1_000_000)): (
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
            round(r["total_value"], 4),
        )
        for r in got_rows
    }
    want = _batch_sessions(ev.toPandas())
    assert got == want
    assert len(got) > 0


# ------------------------------------------------------- seed ingestion

def test_seed_ingest_stream_equals_batch_and_dedups(spark, tmp_path):
    import os

    from ieps_crawler_spark.streaming.seed_stream import (
        canonicalize_seed_lines,
        run_seed_ingest,
    )

    seeds = tmp_path / "seeds"
    seeds.mkdir()
    frontier = str(tmp_path / "frontier")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [
        "http://www.example.gov.si/index.html",   # canon quirk: index strip
        "http://example.gov.si/",                 # same canon as above
        "https://other.gov.si/a/b/?q=1#frag",
        "   ",                                    # blank: dropped
        "http://other.gov.si/a/b/?q=1",           # dup after canon
    ]
    (seeds / "f1.txt").write_text("\n".join(batch1))
    run_seed_ingest(spark, str(seeds), frontier, ckpt)
    got1 = {
        (r["canon_url"], r["host"])
        for r in spark.read.parquet(frontier).collect()
    }
    exp1 = {
        (r["canon_url"], r["host"])
        for r in canonicalize_seed_lines(
            spark.read.text(str(seeds))
        ).collect()
    }
    assert got1 == exp1 and len(got1) >= 2

    # second file: overlap + one new url; only the new one appends
    (seeds / "f2.txt").write_text(
        "http://www.example.gov.si/index.html\nhttp://fresh.gov.si/new"
    )
    run_seed_ingest(spark, str(seeds), frontier, ckpt)
    got2 = {
        (r["canon_url"], r["host"])
        for r in spark.read.parquet(frontier).collect()
    }
    new = got2 - got1
    assert len(got2) == len(got1) + 1 and len(new) == 1
    assert next(iter(new))[1] == "fresh.gov.si"
    # batch twin over ALL files agrees with the streamed frontier
    exp2 = {
        (r["canon_url"], r["host"])
        for r in canonicalize_seed_lines(
            spark.read.text(str(seeds))
        ).collect()
    }
    assert got2 == exp2
