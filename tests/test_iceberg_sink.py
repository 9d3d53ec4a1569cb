"""Iceberg sink: exercises the real writeTo path when a catalog is
configured; cleanly skips (not silently passes) without Iceberg jars."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.sinks.iceberg import IcebergTableSink, iceberg_catalogs


def test_catalog_detection_without_jars(spark):
    # this sandbox has no Iceberg runtime: detection must return [] and
    # never raise
    assert iceberg_catalogs(spark) == []


def test_roundtrip_when_catalog_available(spark):
    cats = iceberg_catalogs(spark)
    if not cats:
        pytest.skip("no Iceberg catalog configured in this session")
    sink = IcebergTableSink(spark, f"{cats[0]}.ieps_test")
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    sink.replace_snapshot("t_state", df)
    assert sink.read("t_state").count() == 10
    sink.append_delta("t_delta", df)
    sink.append_delta("t_delta", df)
    assert sink.read("t_delta").count() == 20
