"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark at the given sf dir, run the
matching oracle_sql() in DuckDB over the same parquet files, and compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in idx))
    out.sort()
    return [cols[i] for i in idx], out


_LIST_RE = __import__("re").compile(
    r"^(?:array|list|large_list|fixed_size_list)<(?:item:|element:)?\s*(.*?)(?:\[\d+\])?>$"
)
_INT_RE = __import__("re").compile(
    r"^(u?int\d*|tinyint|smallint|bigint|hugeint|long|short|byte)$"
)
_FLOAT_RE = __import__("re").compile(r"^(float\d*|double|halffloat|real)$")


def type_family(t: str) -> str:
    """Collapse an engine type name (Spark simpleString or Arrow
    str(type)) to a comparable family.  int and decimal are DISTINCT
    families on purpose: DuckDB window `sum()` over INTEGER/BIGINT
    yields decimal128(38,0) at the Arrow layer even though fetchall()
    converts it to Python int — the exact drift the driver's
    type-sensitive value hash sees and a fetchall-based gate is
    structurally blind to (r2 `crawl_anchor_stats`, r3
    `events_sessionize`/`pipeline_pack_sequences` post-mortems)."""
    t = t.lower().strip()
    m = _LIST_RE.match(t)
    if m:
        return f"list<{type_family(m.group(1))}>"
    if _INT_RE.match(t):
        return "int"
    if _FLOAT_RE.match(t):
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith(("timestamp", "date", "time")):
        return "datetime"
    if t in ("string", "large_string", "utf8", "large_utf8", "varchar"):
        return "string"
    if t in ("bool", "boolean"):
        return "bool"
    if t in ("binary", "large_binary", "blob"):
        return "binary"
    return t


def arrow_type_sig(schema) -> dict:
    """pyarrow.Schema -> {col: family}."""
    return {f.name: type_family(str(f.type)) for f in schema}


def spark_type_sig(sdf) -> dict:
    """Spark DataFrame -> {col: family}."""
    return {
        f.name: type_family(f.dataType.simpleString())
        for f in sdf.schema.fields
    }


def type_sig_diff(ssig: dict, dsig: dict) -> dict:
    """Columns whose Spark-vs-oracle Arrow type families differ.
    All-NULL Arrow columns type as 'null' — not comparable, skipped."""
    return {
        c: (ssig[c], dsig[c])
        for c in ssig
        if c in dsig
        and "null" not in (ssig[c], dsig[c])
        and ssig[c] != dsig[c]
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as e
    from ieps_crawler_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok~   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            # .arrow() (not fetchall) so the oracle's TRUE column types
            # are visible: fetchall converts decimal128(38,0) window
            # sums to plain Python int, hiding the int-vs-decimal drift
            # the driver hash is sensitive to.
            tbl = con.execute(oracles[name]).arrow()
            dcols = list(tbl.schema.names)
            dsig = arrow_type_sig(tbl.schema)
            drows = list(zip(*(col.to_pylist() for col in tbl.columns))) \
                if tbl.num_rows else []
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        sc, sn = norm_rows(scols, srows)
        dc, dn = norm_rows(dcols, drows)
        tdiff = type_sig_diff(spark_type_sig(sdf), dsig)
        if tdiff:
            failures.append(name)
            print(f"FAIL  {name}: value TYPES differ (driver-hash risk): {tdiff}")
            continue
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            continue
        if len(sn) != len(dn):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sn)} duck={len(dn)}")
            continue
        if sn != dn:
            failures.append(name)
            bad = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs: {bad}")
            continue
        print(f"OK    {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
