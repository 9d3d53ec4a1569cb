"""Cardinality sketch (md5-HLL) and exact-quantile operators: Python-
oracle parity, merge algebra, accuracy bounds, partition independence."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.operators.stats import (
    disc_quantiles,
    hll_corrected,
    hll_estimate,
    hll_merge,
    hll_registers,
)

B_HEX, R_HEX = 3, 12
W = R_HEX * 4


def _py_registers(keys):
    regs = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        b = h[:B_HEX]
        bits = format(int(h[B_HEX : B_HEX + R_HEX], 16), f"0{W}b")
        i = bits.find("1")
        rank = W + 1 if i < 0 else i + 1
        regs[b] = max(regs.get(b, 0), rank)
    return regs


def test_registers_match_python_oracle(spark):
    keys = list(range(300))
    df = spark.createDataFrame([(k,) for k in keys], "k long").withColumn(
        "g", F.lit("a")
    )
    got = {
        r["bucket"]: r["register"]
        for r in hll_registers(df, ["g"], "k").collect()
    }
    assert got == _py_registers(keys)


def test_merge_is_union(spark):
    a = spark.createDataFrame([(k,) for k in range(200)], "k long")
    b = spark.createDataFrame([(k,) for k in range(150, 400)], "k long")
    both = a.unionByName(b)
    lit_g = lambda d: d.withColumn("g", F.lit("x"))  # noqa: E731
    merged = hll_merge(
        hll_registers(lit_g(a), ["g"], "k").unionByName(
            hll_registers(lit_g(b), ["g"], "k")
        ),
        ["g"],
    )
    direct = hll_registers(lit_g(both), ["g"], "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_estimate_accuracy_and_python_parity(spark):
    n = 5000
    df = spark.createDataFrame(
        [(k % n,) for k in range(2 * n)], "k long"
    ).withColumn("g", F.lit("a"))
    row = hll_estimate(hll_registers(df, ["g"], "k"), ["g"]).collect()[0]
    # python twin of the exact-integer algebra
    regs = _py_registers(range(n))
    m = 16**B_HEX
    s = sum(1 << (W + 1 - r) for r in regs.values()) + (m - len(regs)) * (
        1 << (W + 1)
    )
    assert row["harm_num"] == s
    assert row["n_zero_buckets"] == m - len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    assert row["hll_est"] == math.floor(alpha * m * m * float(1 << (W + 1)) / s)
    # n=5000 < 2.5·m=10240 is the linear-counting regime: accuracy is
    # asserted on the corrected estimator (the consumer-facing path);
    # the raw hll_est above is only checked for exact-integer parity
    est = hll_corrected(row["harm_num"], row["n_zero_buckets"])
    assert abs(est - n) / n < 0.04


def test_estimate_accuracy_raw_regime(spark):
    # n=30000 > 2.5·m: raw HLL is unbiased here (rel err ~1.6 % at
    # m=4096); duplicates must not move the estimate
    n = 30000
    df = spark.createDataFrame(
        [(k % n,) for k in range(n + 2000)], "k long"
    ).withColumn("g", F.lit("a"))
    row = hll_estimate(hll_registers(df, ["g"], "k"), ["g"]).collect()[0]
    assert abs(row["hll_est"] - n) / n < 0.06
    assert hll_corrected(row["harm_num"], row["n_zero_buckets"]) == pytest.approx(
        float(row["hll_est"]), abs=1.0
    )


def test_small_range_correction():
    # 10 distinct keys: raw HLL over-corrects, linear counting recovers
    regs = _py_registers(range(10))
    m = 16**B_HEX
    s = sum(1 << (W + 1 - r) for r in regs.values()) + (m - len(regs)) * (
        1 << (W + 1)
    )
    est = hll_corrected(s, m - len(regs))
    assert abs(est - 10) < 1.5


def _py_disc(vals, p):
    s = sorted(vals)
    return s[math.ceil(p * len(s)) - 1]


def test_quantiles_match_python_oracle(spark):
    import random

    rng = random.Random(7)
    rows = [("g1", rng.randint(0, 50)) for _ in range(997)] + [
        ("g2", v) for v in [5, 5, 5, 5, 9]  # heavy ties + tiny group
    ] + [("g3", 42)]  # singleton group
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in disc_quantiles(df, ["g"], "v").collect()}
    byg = {}
    for g, v in rows:
        byg.setdefault(g, []).append(v)
    for g, vals in byg.items():
        assert got[g]["n_rows"] == len(vals)
        for p, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            assert got[g][col] == _py_disc(vals, p), (g, p)


def test_quantiles_partition_independent(spark):
    import random

    rng = random.Random(3)
    rows = [("g", rng.randint(0, 9)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    a = disc_quantiles(df.repartition(1), ["g"], "v").collect()
    b = disc_quantiles(df.repartition(16, "v"), ["g"], "v").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------- count-min sketch

def _py_cms_bucket(key, j, width=1024):
    import hashlib

    h = hashlib.md5(f"{key}#cms{j}".encode()).hexdigest()[:8]
    return int(h, 16) % width


def _py_cms(keys, depth=4, width=1024):
    cells = {}
    for k in keys:
        for j in range(depth):
            cell = (j, _py_cms_bucket(k, j, width))
            cells[cell] = cells.get(cell, 0) + 1
    return cells


def test_cms_registers_python_oracle(spark):
    from ieps_crawler_spark.operators.stats import cms_sketch

    keys = [f"k{i % 37}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_sketch(df, "k", depth=4, width=64).collect()
    }
    assert got == _py_cms(keys, 4, 64)


def test_cms_estimate_never_undercounts_and_is_tight(spark):
    from collections import Counter

    from ieps_crawler_spark.operators.stats import cms_estimate, cms_sketch

    keys = [f"u{i % 200}" for i in range(2000)] + ["hot"] * 300
    true = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    sk = cms_sketch(df, "k", depth=4, width=1024)
    probes = spark.createDataFrame(
        [(k,) for k in ["hot", "u0", "u7", "never-seen"]], "k string"
    )
    est = {r["k"]: r["est"] for r in cms_estimate(sk, probes, "k").collect()}
    for k, e in est.items():
        assert e >= true.get(k, 0), k
    # 2200 increments over 4x1024 cells: overestimates are tiny
    assert est["hot"] <= true["hot"] + 25
    assert est["never-seen"] <= 25


def test_cms_merge_equals_concat_build(spark):
    from ieps_crawler_spark.operators.stats import cms_merge, cms_sketch

    a = [f"a{i % 11}" for i in range(150)]
    b = [f"b{i % 7}" for i in range(90)] + a[:40]
    da = spark.createDataFrame([(k,) for k in a], "k string")
    db = spark.createDataFrame([(k,) for k in b], "k string")
    dall = spark.createDataFrame([(k,) for k in a + b], "k string")
    merged = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            cms_sketch(da, "k", width=64), cms_sketch(db, "k", width=64)
        ).collect()
    }
    direct = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_sketch(dall, "k", width=64).collect()
    }
    assert merged == direct


# ------------------------------------------------- HDR quantile sketch

def _py_hdr_bucket(v, s=3):
    bl = max(1, v.bit_length())  # bin(0) = '0' -> length 1
    shift = max(0, bl - (1 + s))
    return (bl - 1) * (1 << (s + 1)) + (v >> shift)


def _py_hdr_lower(bucket, s=3):
    m = 1 << (s + 1)
    msb, q = divmod(bucket, m)
    return q << max(0, msb - s)


def test_hdr_registers_python_oracle(spark):
    from collections import Counter

    from ieps_crawler_spark.operators.stats import hdr_registers

    vals = [0, 1, 2, 3, 7, 8, 15, 16, 17, 100, 1000, 12345, 2**40 + 5]
    vals = vals * 3 + list(range(50))
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    got = {
        r["bucket"]: r["cnt"]
        for r in hdr_registers(df, ["g"], "v").collect()
    }
    exp = Counter(_py_hdr_bucket(v) for v in vals)
    assert got == dict(exp)


def test_hdr_bucket_order_matches_value_order(spark):
    # bucket ids must be monotone with value ranges — the quantile walk
    # depends on it
    prev_b, prev_v = -1, -1
    for v in sorted(set(list(range(200)) + [2**k + d for k in range(5, 50, 3) for d in (-1, 0, 1)])):
        b = _py_hdr_bucket(v)
        assert b >= prev_b, (v, b, prev_b)
        if b == prev_b:
            assert _py_hdr_lower(b) <= v
        prev_b, prev_v = b, v


def test_hdr_estimate_within_relative_band(spark):
    import math
    import random

    from ieps_crawler_spark.operators.stats import hdr_estimate, hdr_registers

    rng = random.Random(23)
    rows = [("a", int(math.exp(rng.uniform(0, 12)))) for _ in range(3000)]
    rows += [("b", rng.randrange(0, 50)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    regs = hdr_registers(df, ["g"], "v")
    est = {r["g"]: r for r in hdr_estimate(regs, ["g"]).collect()}
    for g in ("a", "b"):
        vals = sorted(v for gg, v in rows if gg == g)
        for p, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            exact = vals[math.ceil(p * len(vals)) - 1]
            lo = est[g][col]
            assert lo <= exact, (g, p, lo, exact)
            # exact value lies inside the bucket: lower bound within
            # 2^-sub_bits relative band (+1 covers the tiny-value regime)
            assert exact <= lo + max(1, lo >> 3), (g, p, lo, exact)


def test_hdr_merge_equals_concat_build(spark):
    from ieps_crawler_spark.operators.stats import hdr_merge, hdr_registers

    a = [("g", v) for v in range(0, 300, 7)]
    b = [("g", v * 13) for v in range(100)]
    da = spark.createDataFrame(a, "g string, v long")
    db = spark.createDataFrame(b, "g string, v long")
    dall = spark.createDataFrame(a + b, "g string, v long")
    merged = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in hdr_merge(
            hdr_registers(da, ["g"], "v"), hdr_registers(db, ["g"], "v")
        ).collect()
    }
    direct = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in hdr_registers(dall, ["g"], "v").collect()
    }
    assert merged == direct


# ------------------------------------------------------------ skew_report

def test_skew_report_python_oracle(spark):
    import math
    from collections import Counter

    from ieps_crawler_spark.operators.stats import skew_report

    rows = (
        [("hot", i) for i in range(500)]
        + [("warm", i) for i in range(60)]
        + [(f"k{j}", i) for j in range(20) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "key string, x long")
    r = skew_report(df, "key", top_k=3).collect()[0]
    counts = Counter(k for k, _ in rows)
    assert r["n_keys"] == len(counts)
    assert r["n_rows"] == len(rows)
    assert r["max_rows"] == 500
    vals = sorted(counts.values())
    assert r["p50_rows"] == vals[math.ceil(0.5 * len(vals)) - 1]
    assert r["p99_rows"] == vals[math.ceil(0.99 * len(vals)) - 1]
    assert r["top_keys"] == "hot=500,warm=60,k0=5"  # ties by key asc


def test_skew_report_partition_independent_and_plan(spark):
    from ieps_crawler_spark.operators.stats import skew_report
    from ieps_crawler_spark.plans.audit import assert_scale_safe

    rows = [(f"k{i % 13}", i) for i in range(400)]
    df = spark.createDataFrame(rows, "key string, x long")
    a = skew_report(df, "key").collect()
    b = skew_report(df.repartition(11), "key").collect()
    assert list(map(tuple, a)) == list(map(tuple, b))
    assert_scale_safe(skew_report(df, "key"))


def test_plan_audit_api(spark):
    import pytest

    from ieps_crawler_spark.plans.audit import (
        PlanViolation,
        assert_scale_safe,
        plan_counts,
    )

    a = spark.createDataFrame([(1, 2)], "x long, y long")
    b = spark.createDataFrame([(1, 9)], "x long, z long")
    good = a.join(b, "x")
    c = plan_counts(good)
    assert c["nested_loop_joins"] == 0 and c["python_stages"] == 0
    assert_scale_safe(good)
    # a non-equi join plans as a nested loop -> flagged
    bad = a.join(b, a.y < b.z)
    with pytest.raises(PlanViolation):
        assert_scale_safe(bad)
    # ...unless explicitly whitelisted
    assert_scale_safe(
        bad, allow=("BroadcastNestedLoopJoin", "CartesianProduct")
    )
