"""The local oracle gate must be driver-faithful on TYPES.

r2 (`crawl_anchor_stats`) and r3 (`events_sessionize`,
`pipeline_pack_sequences`) both shipped driver-red on the same class of
bug: a DuckDB window `sum()` over INTEGER/BIGINT yields decimal128(38,0)
at the Arrow layer, which the driver's type-sensitive value hash sees,
while `fetchall()` converts it to plain Python int — so a
fetchall-based type check is structurally blind to it.  These tests pin
the fixed gate: red on an intentionally uncast `sum() OVER` fixture,
green once the oracle casts to BIGINT.
"""

import duckdb
import pytest

from tools.check_oracles import (
    arrow_type_sig,
    spark_type_sig,
    type_family,
    type_sig_diff,
)


def test_type_family_collapses_engine_names():
    assert type_family("bigint") == "int"
    assert type_family("int64") == "int"
    assert type_family("hugeint") == "int"
    assert type_family("decimal128(38, 0)") == "decimal"
    assert type_family("decimal(38,0)") == "decimal"
    assert type_family("double") == "float"
    assert type_family("float64") == "float"
    assert type_family("timestamp[us]") == "datetime"
    assert type_family("timestamp") == "datetime"
    assert type_family("large_string") == "string"
    assert type_family("array<bigint>") == "list<int>"
    assert type_family("list<item: int64>") == "list<int>"


def test_gate_reds_on_uncast_window_sum(spark):
    """The exact r3 failure shape: uncast DuckDB window sum vs Spark
    bigint.  fetchall() would report Python int on both sides; the
    Arrow schema must expose the decimal."""
    con = duckdb.connect()
    tbl = con.execute(
        "SELECT sum(x) OVER (ORDER BY x) AS s FROM range(5) t(x)"
    ).arrow()
    dsig = arrow_type_sig(tbl.schema)
    assert dsig["s"] == "decimal", f"expected decimal, got {dsig}"
    # fetchall is blind — documents WHY the gate must read Arrow schemas
    vals = con.execute(
        "SELECT sum(x) OVER (ORDER BY x) AS s FROM range(5) t(x)"
    ).fetchall()
    assert type(vals[0][0]) is int

    sdf = spark.sql("SELECT CAST(10 AS BIGINT) AS s")
    ssig = spark_type_sig(sdf)
    assert ssig["s"] == "int"
    diff = type_sig_diff(ssig, dsig)
    assert diff == {"s": ("int", "decimal")}


def test_gate_green_on_cast_window_sum(spark):
    con = duckdb.connect()
    tbl = con.execute(
        "SELECT CAST(sum(x) OVER (ORDER BY x) AS BIGINT) AS s "
        "FROM range(5) t(x)"
    ).arrow()
    dsig = arrow_type_sig(tbl.schema)
    sdf = spark.sql("SELECT CAST(10 AS BIGINT) AS s")
    assert type_sig_diff(spark_type_sig(sdf), dsig) == {}


def test_gate_skips_all_null_columns(spark):
    # DuckDB types a bare NULL projection (int32), but an untyped Arrow
    # column still reads as 'null' — the gate must not flag it.
    import pyarrow as pa

    tbl = pa.table({"c": pa.array([None, None], type=pa.null())})
    dsig = arrow_type_sig(tbl.schema)
    assert dsig["c"] == "null"
    sdf = spark.sql("SELECT CAST(NULL AS STRING) AS c")
    assert type_sig_diff(spark_type_sig(sdf), dsig) == {}
