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


def type_sig(cols, rows):
    """Per-column Python type of the first non-None value, sorted by
    column name.  The driver's value hash is type/format-sensitive
    (r2 post-mortem: DuckDB sum(BIGINT) -> HUGEINT/Decimal hashed
    differently from Spark's bigint despite equal values), so the local
    gate must flag int-vs-Decimal-vs-float drift, not just str() drift."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    sig = {}
    for i in idx:
        t = None
        for r in rows:
            if r[i] is not None:
                t = type(r[i]).__name__
                break
        sig[cols[i]] = t
    return sig


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
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        sc, sn = norm_rows(scols, srows)
        dc, dn = norm_rows(dcols, drows)
        ssig, dsig = type_sig(scols, srows), type_sig(dcols, drows)
        tdiff = {
            c: (ssig.get(c), dsig.get(c))
            for c in ssig
            if c in dsig
            and ssig[c] is not None
            and dsig[c] is not None
            and ssig[c] != dsig[c]
            # datetime/date naming drift between engines is benign;
            # int-vs-Decimal-vs-float is the driver-hash killer.
            and {ssig[c], dsig[c]} & {"int", "float", "Decimal"}
        }
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
