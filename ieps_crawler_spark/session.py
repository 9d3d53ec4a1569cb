"""SparkSession factory with the engine's tuned defaults.

Scale posture (100 TB / 1000-executor design, tested on local[N]):
- AQE on (runtime coalesce + skew-join splitting) — host distribution of a
  web corpus is heavy-tailed (reference saw a few giant hosts among 288-327,
  report/report.tex:173-174), so skew handling must be on by default.
- Arrow on — all Python logic in this engine is pandas/Arrow UDFs
  (input_hint mandate: no per-row Python).
- UTC session timezone — matches the reference's Joda UTC timestamps
  (build.sbt:70-80).
- shuffle.partitions defaults to the local core count; on a real cluster
  this is set per-job (2-3x total cores) via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ieps_crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        # 2x core count: the classic sizing — finer tasks smooth stragglers
        # from skewed partitions; AQE coalesces them back when small
        shuffle_partitions = 64 if n == "*" else max(8, 2 * int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter pushdown: a semi-join filter built from the
        # small join side prunes the big side's scan before the shuffle —
        # on a bucketed/sorted corpus the fetch join then touches only the
        # row groups that can contain batch urls
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
