"""Deterministic sampling/split operators: partition-independence,
nesting, coverage — the properties df.sample()/rand() cannot give."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    split_thresholds_hex,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")


def test_split_disjoint_exhaustive_and_roughly_proportional(spark, docs):
    res = hash_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in res.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # exhaustive, one split per row
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 0.8 * n  # 0.9 nominal, wide tolerance at n=500


def test_split_is_partition_independent(spark, docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(17, "doc_id"), "doc_id").collect()
    }
    assert a == b


def test_salt_redraws_assignment(spark, docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", salt="v2").collect()}
    assert a != b
    assert set(a) == set(b)  # same rows, different draw


def test_sample_nesting_and_determinism(spark, docs):
    s10 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    s20 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    s20_again = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(7), "doc_id", 0.2).collect()
    }
    assert s10 <= s20  # ablation ladders nest
    assert s20 == s20_again
    n = docs.count()
    assert 0.05 * n < len(s10) < 0.2 * n
    assert deterministic_sample(docs, "doc_id", 1.0).count() == n


def test_thresholds_cover_full_range():
    b = split_thresholds_hex({"a": 1, "b": 1, "c": 1})
    assert [n for n, _ in b] == ["a", "b", "c"]
    assert b[-1][1] == "f" * 32
    assert b[0][1] < b[1][1] <= b[2][1]
    with pytest.raises(ValueError):
        split_thresholds_hex({"a": 0.0})


def test_pack_sequences_layout(spark):
    from ieps_crawler_spark.operators.sampling import pack_sequences

    # one shard, budget 10: docs of 4,4,4,7,1 tokens -> offsets
    # 0,4,8(straddles),2,9 and seq ids 0,0,0,1,1
    rows = [(i, t) for i, t in enumerate([4, 4, 4, 7, 1])]
    df = spark.createDataFrame(rows, "doc_id long, tokens int")
    got = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["offset"])
        for r in pack_sequences(df, budget=10, shards=1).collect()
    }
    assert got == {
        0: (0, 0, 0),
        1: (0, 0, 4),
        2: (0, 0, 8),
        3: (0, 1, 2),
        4: (0, 1, 9),
    }


def test_pack_sequences_non_power_of_two_budget(spark):
    """budget=1000 (not a power of two): seq_id must come from integer
    division — a float floor path can drift on large cumulative sums.
    Cross-check every row against a Python exact-integer replay."""
    from ieps_crawler_spark.operators.sampling import pack_sequences

    rows = [(i, (i * 7919) % 331 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, tokens int")
    got = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["offset"])
        for r in pack_sequences(df, budget=1000, shards=4).collect()
    }
    cum = {}
    for i, t in rows:  # id order == enumeration order here
        sh = i % 4
        c = cum.get(sh, 0)
        assert got[i] == (sh, c // 1000, c % 1000), (i, got[i], c)
        cum[sh] = c + t


def test_pack_sequences_huge_cumsum_exact(spark):
    """Near-2^53 cumulative sums: double floor-division would round;
    integer `div` must not.  7 * (2^53 // 7 // 1000 * 1000) sits where
    float64 loses unit precision."""
    from ieps_crawler_spark.operators.sampling import pack_sequences

    big = (1 << 53) + 4444  # not representable stepping by 1.0 in f64
    rows = [(0, big), (1, 999), (2, 1)]
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    got = {
        r["doc_id"]: (r["seq_id"], r["offset"])
        for r in pack_sequences(df, budget=1000, shards=1).collect()
    }
    c1 = big
    c2 = big + 999
    assert got[0] == (0, 0)
    assert got[1] == (c1 // 1000, c1 % 1000)
    assert got[2] == (c2 // 1000, c2 % 1000)


def test_pack_sequences_partition_independent(spark, docs):
    from ieps_crawler_spark.operators.sampling import pack_sequences

    toks = docs.withColumn("tokens", (F.col("doc_id") % 37 + 1).cast("int"))
    a = sorted(map(tuple, pack_sequences(toks, shards=8).collect()))
    b = sorted(
        map(tuple, pack_sequences(toks.repartition(13), shards=8).collect())
    )
    assert a == b


def _py_mix_copies(key, source, weights, default=1.0, salt=""):
    import hashlib

    from ieps_crawler_spark.operators.sampling import mix_weight_parts

    base, bound = mix_weight_parts(weights.get(source, default))
    h = hashlib.md5((str(key) + salt + "#mix").encode()).hexdigest()
    return base + (1 if h < bound else 0)


def test_mix_sources_python_oracle(spark):
    from ieps_crawler_spark.operators.sampling import mix_sources

    weights = {"a": 2.5, "b": 0.4, "c": 3.0, "d": 0.0}
    rows = [(i, "abcde"[i % 5]) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {}
    for r in mix_sources(df, weights).collect():
        got.setdefault((r["doc_id"], r["source"]), []).append(r["copy"])
    for (k, s), copies in got.items():
        n = _py_mix_copies(k, s, weights)
        assert sorted(copies) == list(range(n)), (k, s)
    # zero-weight source fully dropped, integral weight exactly n copies
    assert not any(s == "d" for _, s in got)
    for k, s in [(kk, ss) for kk, ss in rows if ss in ("c", "e")]:
        exp = 3 if s == "c" else 1
        assert len(got[(k, s)]) == exp, (k, s)
    # fractional picks land near the target rate (100 keys per source)
    extra_a = sum(1 for (k, s) in got if s == "a" and len(got[(k, s)]) == 3)
    kept_b = sum(1 for (_, s) in got if s == "b")
    assert 30 <= extra_a <= 70 and 20 <= kept_b <= 60


def test_mix_sources_partition_independent_and_salt(spark):
    from ieps_crawler_spark.operators.sampling import mix_sources

    rows = [(i, "xy"[i % 2]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"x": 1.5, "y": 0.5}
    a = sorted(map(tuple, mix_sources(df, w).collect()))
    b = sorted(map(tuple, mix_sources(df.repartition(11, "source"), w).collect()))
    assert a == b
    c = sorted(map(tuple, mix_sources(df, w, salt="v2").collect()))
    assert a != c  # fractional picks re-drawn
    # full epochs are salt-invariant: every key keeps >= floor(w) copies
    per_key = {}
    for k, s, cp in c:
        per_key[(k, s)] = max(per_key.get((k, s), 0), cp + 1)
    for (k, s), n in per_key.items():
        assert n >= (1 if s == "x" else 0)


def test_group_sample_deterministic_and_stable(spark):
    import hashlib

    from ieps_crawler_spark.operators.sampling import group_sample

    rows = [(i, "st"[i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["source"], r["doc_id"])
        for r in group_sample(df, "source", "doc_id", k=4).collect()
    )
    # python twin: 4 smallest md5(key||'#gs') per group
    exp = []
    for g in "st":
        ks = sorted(
            (hashlib.md5(f"{i}#gs".encode()).hexdigest(), i)
            for i, s in rows
            if s == g
        )[:4]
        exp += [(g, i) for _, i in ks]
    assert got == sorted(exp)
    # partition independence
    got2 = sorted(
        (r["source"], r["doc_id"])
        for r in group_sample(
            df.repartition(11), "source", "doc_id", k=4
        ).collect()
    )
    assert got == got2
    # growth stability: adding rows only ever displaces, never reshuffles
    grown = spark.createDataFrame(
        rows + [(i, "st"[i % 2]) for i in range(200, 260)],
        "doc_id long, source string",
    )
    got3 = {
        (r["source"], r["doc_id"])
        for r in group_sample(grown, "source", "doc_id", k=4).collect()
    }
    # every original pick either survives or lost to a lower hash
    for g, i in got:
        if (g, i) not in got3:
            h_old = hashlib.md5(f"{i}#gs".encode()).hexdigest()
            newer = [
                hashlib.md5(f"{j}#gs".encode()).hexdigest()
                for j in range(200, 260)
                if "st"[j % 2] == g
            ]
            assert any(h < h_old for h in newer), (g, i)
