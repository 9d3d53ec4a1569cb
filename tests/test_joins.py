"""asof_join vs a pure-Python oracle: backward inclusive semantics,
no-match nulls, tolerance, tie handling, partition independence."""

import random

from pyspark.sql import functions as F

from ieps_crawler_spark.operators.joins import asof_join


def _py_asof(left_rows, right_rows, tolerance=None):
    """left/right: (key, ts, ...payload). Returns {left index: matched
    right row or None} under backward-inclusive ASOF semantics with
    greatest-payload tie break."""
    by_key = {}
    for r in right_rows:
        by_key.setdefault(r[0], []).append(r)
    out = {}
    for i, (k, ts, *_rest) in enumerate(left_rows):
        cands = [r for r in by_key.get(k, []) if r[1] <= ts]
        if tolerance is not None:
            cands = [r for r in cands if ts - r[1] <= tolerance]
        if not cands:
            out[i] = None
        else:
            m = max(c[1] for c in cands)
            out[i] = max(r[2:] for r in cands if r[1] == m)
    return out


def _frames(spark, left_rows, right_rows, parts=None):
    l = spark.createDataFrame(
        [(k, float(ts), i) for i, (k, ts) in enumerate(left_rows)],
        "k long, ts double, lid long",
    )
    r = spark.createDataFrame(
        [(k, float(ts), v) for k, ts, v in right_rows],
        "k long, ts double, val long",
    )
    if parts:
        l, r = l.repartition(parts), r.repartition(parts)
    return l, r


def test_asof_join_python_oracle(spark):
    rng = random.Random(7)
    left = [(rng.randrange(12), rng.randrange(1000)) for _ in range(400)]
    right = [
        (rng.randrange(12), rng.randrange(1000), rng.randrange(10**6))
        for _ in range(300)
    ]
    exp = _py_asof([(k, t) for k, t in left], right)
    l, r = _frames(spark, left, right)
    got = {
        row["lid"]: (row["asof_ts"], row["val"])
        for row in asof_join(l, r, "k", "ts", "ts").collect()
    }
    assert len(got) == len(left)
    for i, m in exp.items():
        if m is None:
            assert got[i] == (None, None), i
        else:
            k, ts = left[i]
            cands = [x for x in right if x[0] == k and x[1] <= ts]
            mts = max(c[1] for c in cands)
            assert got[i] == (float(mts), m[0]), i


def test_asof_join_inclusive_and_nomatch(spark):
    l, r = _frames(spark, [(1, 100), (1, 99), (2, 100)], [(1, 100, 5)])
    rows = {x["lid"]: x for x in asof_join(l, r, "k").collect()}
    assert rows[0]["val"] == 5  # right at exactly left ts matches
    assert rows[1]["val"] is None  # earlier left row: no state yet
    assert rows[2]["val"] is None  # other key never matches


def test_asof_join_tolerance(spark):
    l, r = _frames(spark, [(1, 100), (1, 200)], [(1, 90, 7)])
    rows = {
        x["lid"]: x["val"]
        for x in asof_join(l, r, "k", tolerance=50).collect()
    }
    assert rows[0] == 7  # 10s old: inside tolerance
    assert rows[1] is None  # 110s old: stale match nulled


def test_asof_join_tie_greatest_payload(spark):
    # two right rows at the same (key, ts): greatest payload wins
    l, r = _frames(spark, [(1, 100)], [(1, 50, 3), (1, 50, 9)])
    assert asof_join(l, r, "k").collect()[0]["val"] == 9


def test_asof_join_partition_independent(spark):
    rng = random.Random(11)
    left = [(rng.randrange(6), rng.randrange(300)) for _ in range(200)]
    right = [
        (rng.randrange(6), rng.randrange(300), rng.randrange(100))
        for _ in range(150)
    ]
    l1, r1 = _frames(spark, left, right)
    l2, r2 = _frames(spark, left, right, parts=13)
    a = sorted(map(tuple, asof_join(l1, r1, "k").collect()))
    b = sorted(map(tuple, asof_join(l2, r2, "k").collect()))
    assert a == b


def test_asof_join_column_collision_raises(spark):
    import pytest

    l, r = _frames(spark, [(1, 1)], [(1, 1, 1)])
    with pytest.raises(ValueError):
        asof_join(l.withColumnRenamed("lid", "val"), r, "k")


def test_asof_join_single_shuffle_plan(spark):
    l, r = _frames(spark, [(1, 1), (2, 3)], [(1, 1, 1), (2, 2, 4)])
    plan = (
        asof_join(l, r, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange for the window (plus the createDataFrame parallelize
    # roots) — no join operator, no pair blow-up
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------- range_join_points

def _py_range_join(points, intervals, keyed=True):
    out = set()
    for pi, (pk, x) in enumerate(points):
        for ii, (ik, lo, hi) in enumerate(intervals):
            if (not keyed or pk == ik) and lo <= x <= hi:
                out.add((pi, ii))
    return out


def test_range_join_python_oracle(spark):
    import random

    from ieps_crawler_spark.operators.joins import range_join_points

    rng = random.Random(5)
    points = [(rng.randrange(8), rng.uniform(0, 1000)) for _ in range(300)]
    intervals = []
    for _ in range(120):
        lo = rng.uniform(0, 1000)
        intervals.append((rng.randrange(8), lo, lo + rng.uniform(0, 80)))
    p = spark.createDataFrame(
        [(k, x, i) for i, (k, x) in enumerate(points)],
        "k long, x double, pid long",
    )
    iv = spark.createDataFrame(
        [(k, lo, hi, i) for i, (k, lo, hi) in enumerate(intervals)],
        "k long, lo double, hi double, iid long",
    )
    for width in (10.0, 40.0, 500.0):
        got = {
            (r["pid"], r["iid"])
            for r in range_join_points(
                p, iv, "x", "lo", "hi", on="k", bucket_width=width
            ).collect()
        }
        assert got == _py_range_join(points, intervals), width


def test_range_join_unkeyed_and_boundaries(spark):
    from ieps_crawler_spark.operators.joins import range_join_points

    p = spark.createDataFrame(
        [(10.0, 1), (20.0, 2), (20.5, 3)], "x double, pid long"
    )
    iv = spark.createDataFrame(
        [(10.0, 20.0, 1)], "lo double, hi double, iid long"
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_points(p, iv, "x", "lo", "hi", bucket_width=7.0).collect()
    }
    assert got == {(1, 1), (2, 1)}  # both endpoints inclusive, 20.5 out


def test_range_join_no_nested_loop_plan(spark):
    from ieps_crawler_spark.operators.joins import range_join_points

    p = spark.createDataFrame([(1, 5.0, 1)], "k long, x double, pid long")
    iv = spark.createDataFrame(
        [(1, 0.0, 10.0, 1)], "k long, lo double, hi double, iid long"
    )
    plan = (
        range_join_points(p, iv, "x", "lo", "hi", on="k", bucket_width=5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_range_join_collision_raises(spark):
    import pytest

    from ieps_crawler_spark.operators.joins import range_join_points

    p = spark.createDataFrame([(1, 5.0)], "k long, x double")
    iv = spark.createDataFrame([(1, 0.0, 10.0, 3.0)], "k long, lo double, hi double, x double")
    with pytest.raises(ValueError):
        range_join_points(p, iv, "x", "lo", "hi", on="k")
