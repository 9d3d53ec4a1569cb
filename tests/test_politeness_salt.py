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
