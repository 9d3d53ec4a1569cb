"""Equivalence of the skew-proof two-phase politeness top-k (salted
pre-prune + exact rank) with the single-phase window: batch rows must be
identical including fetch_order and sched_ts, and batch ∪ leftover must
partition the frontier (north_rule skew handling, SURVEY O6/O17)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ieps_crawler_spark.operators.politeness import host_delays, select_budget


def _frontier(spark, n_rows=3000, n_hosts=7):
    # heavy-tailed: host h0 owns ~60% of rows
    return spark.range(n_rows).select(
        F.concat(
            F.lit("http://h"),
            F.when(F.col("id") % 5 < 3, F.lit(0)).otherwise(
                F.pmod(F.col("id"), n_hosts)
            ).cast("string"),
            F.lit(".gov.si/p"),
            F.col("id").cast("string"),
            F.lit("/"),
        ).alias("canon_url"),
        F.concat(
            F.lit("h"),
            F.when(F.col("id") % 5 < 3, F.lit(0)).otherwise(
                F.pmod(F.col("id"), n_hosts)
            ).cast("string"),
        ).alias("host"),
        F.lit(0).alias("data_type"),
        F.lit(None).cast("string").alias("ref_url"),
        (F.col("id") % 3).cast("int").alias("wave"),
        F.lit(0).alias("priority"),
        F.col("id").alias("enq_seq"),
    )


def _sites(spark, n_hosts=7):
    rows = [
        (f"h{i}", f"User-agent: *\nCrawl-delay: {1 + i % 3}\n" if i % 2 else None,
         None)
        for i in range(n_hosts)
    ]
    return spark.createDataFrame(
        rows, "host string, robots_content string, sitemap_content string"
    )


def _collect(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_budget_matches_single_phase(spark):
    fr = _frontier(spark)
    delays = host_delays(_sites(spark))
    batch0, left0 = select_budget(fr, delays, wave=2, wave_seconds=30)
    batch1, left1 = select_budget(
        fr, delays, wave=2, wave_seconds=30, salt_shards=5
    )
    cols = ["canon_url", "host", "fetch_order",
            F.date_format("sched_ts", "yyyy-MM-dd HH:mm:ss").alias("ts")]
    assert _collect(batch0, cols) == _collect(batch1, cols)
    lcols = ["canon_url", "host", "enq_seq"]
    assert _collect(left0, lcols) == _collect(left1, lcols)
    # batch ∪ leftover partitions the frontier
    n = fr.count()
    assert batch1.count() + left1.count() == n


# ------------------------------------------------------- adaptive_delays

def _py_p95(vals, p=0.95):
    import math

    vals = sorted(vals)
    return vals[math.ceil(p * len(vals)) - 1]


def test_adaptive_delays_python_oracle(spark):
    import random

    from ieps_crawler_spark.operators.politeness import adaptive_delays

    rng = random.Random(13)
    rows = []
    for h, base in [("slow", 2000), ("fast", 20), ("mid", 900)]:
        rows += [(h, base + rng.randrange(100)) for _ in range(97)]
    df = spark.createDataFrame(rows, "host string, load_time_ms long")
    got = {r["host"]: (r["load_p_ms"], r["delay_ms"])
           for r in adaptive_delays(df).collect()}
    for h in ("slow", "fast", "mid"):
        vals = [v for hh, v in rows if hh == h]
        p95 = _py_p95(vals)
        assert got[h][0] == p95, h
        assert got[h][1] == max(500, min(10_000, 3 * p95)), h
    # clamps actually engage: fast floored at 500, slow un-ceilinged
    assert got["fast"][1] == 500
    assert got["slow"][1] == min(10_000, 3 * got["slow"][0])


def test_adaptive_delays_partition_independent(spark):
    import random

    from ieps_crawler_spark.operators.politeness import adaptive_delays

    rng = random.Random(17)
    rows = [("h%d" % (i % 5), rng.randrange(5000)) for i in range(400)]
    df = spark.createDataFrame(rows, "host string, load_time_ms long")
    a = sorted(map(tuple, adaptive_delays(df).collect()))
    b = sorted(map(tuple, adaptive_delays(df.repartition(9)).collect()))
    assert a == b


# --------------------------------------------------------- detect_traps

def test_detect_traps_python_oracle(spark):
    from ieps_crawler_spark.operators.politeness import detect_traps

    rows = (
        # trap: 40 urls, only 4 distinct contents (900 permille dup)
        [("trap.si", f"c{i % 4}") for i in range(40)]
        # healthy: 40 urls, 40 distinct
        + [("ok.si", f"u{i}") for i in range(40)]
        # dup-heavy but tiny: below min_urls, never flagged
        + [("tiny.si", "same") for _ in range(5)]
    )
    df = spark.createDataFrame(rows, "host string, content_hash string")
    got = {r["host"]: r for r in detect_traps(df).collect()}
    assert got["trap.si"]["is_trap"] is True
    assert got["trap.si"]["n_urls"] == 40
    assert got["trap.si"]["n_distinct"] == 4
    assert got["trap.si"]["dup_permille"] == (40 - 4) * 1000 // 40
    assert got["ok.si"]["is_trap"] is False
    assert got["ok.si"]["dup_permille"] == 0
    assert got["tiny.si"]["is_trap"] is False  # min_urls gate
    assert got["tiny.si"]["dup_permille"] == 800


def test_detect_traps_partition_independent(spark):
    from ieps_crawler_spark.operators.politeness import detect_traps

    rows = [(f"h{i % 7}", f"c{i % 11}") for i in range(300)]
    df = spark.createDataFrame(rows, "host string, content_hash string")
    a = sorted(map(tuple, detect_traps(df).collect()))
    b = sorted(map(tuple, detect_traps(df.repartition(9)).collect()))
    assert a == b
