"""DSIR importance-resampling tests (operators/dsir.py): bucket-hash
agreement with a Python replay, fit counts, hand-checked weights,
deterministic Gumbel-top-k resampling."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.operators.dsir import (
    dsir_fit,
    dsir_resample,
    dsir_weights,
    gram_buckets,
)

B = 97  # small prime so bucket collisions actually occur in tests


def _py_grams(text, ns=(1, 2)):
    toks = " ".join(text.lower().split()).split(" ") if text.strip() else []
    toks = [t for t in toks if toks != [""]]
    if toks == [""]:
        toks = []
    out = []
    for n in ns:
        if len(toks) >= n:
            out += [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return out


def _py_bucket(g, b=B):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % b


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gram_buckets_match_python_replay(spark):
    text = "The  quick brown fox  jumps"
    df = _docs(spark, [(1, text)]).select(
        gram_buckets("text", B).alias("bk")
    )
    got = sorted(df.collect()[0]["bk"])
    want = sorted(_py_bucket(g) for g in _py_grams(text))
    assert got == want and len(got) == 5 + 4


def test_gram_buckets_empty_and_single_word(spark):
    rows = _docs(spark, [(1, "   "), (2, "word")]).select(
        "doc_id", gram_buckets("text", B).alias("bk")
    ).collect()
    got = {r["doc_id"]: list(r["bk"]) for r in rows}
    assert got[1] == []
    assert got[2] == [_py_bucket("word")]


def test_dsir_fit_counts(spark):
    target = _docs(spark, [(1, "aa bb")])
    raw = _docs(spark, [(1, "aa bb"), (2, "aa cc")])
    fit = {r["bucket"]: (r["t_cnt"], r["r_cnt"]) for r in
           dsir_fit(target, raw, n_buckets=B).collect()}
    from collections import Counter

    tc = Counter(_py_bucket(g) for g in _py_grams("aa bb"))
    rc = Counter(
        _py_bucket(g) for g in _py_grams("aa bb") + _py_grams("aa cc")
    )
    assert fit == {b: (tc.get(b, 0), rc[b]) for b in rc}


def test_dsir_weights_hand_computed(spark):
    target = _docs(spark, [(1, "aa bb")])
    raw = _docs(spark, [(1, "aa bb"), (2, "aa cc")])
    fit = dsir_fit(target, raw, n_buckets=B)
    docs = _docs(spark, [(10, "aa bb"), (11, "cc cc"), (12, "")])
    got = {
        r["doc_id"]: r for r in
        dsir_weights(docs, fit, n_buckets=B).collect()
    }

    from collections import Counter

    tc = Counter(_py_bucket(g) for g in _py_grams("aa bb"))
    rc = Counter(
        _py_bucket(g) for g in _py_grams("aa bb") + _py_grams("aa cc")
    )
    nt, nr = sum(tc.values()), sum(rc.values())

    def w(text):
        return round(
            sum(
                math.log((tc.get(b, 0) + 1) / (nt + B))
                - math.log((rc.get(b, 0) + 1) / (nr + B))
                for b in (_py_bucket(g) for g in _py_grams(text))
            ),
            6,
        )

    r10 = got[10]
    assert (r10["n_grams"], r10["n_unseen_t"]) == (3, 0)
    assert r10["weight"] == pytest.approx(w("aa bb"), abs=2e-6)
    r11 = got[11]
    assert r11["n_grams"] == 3  # cc, cc, "cc cc"
    assert r11["weight"] == pytest.approx(w("cc cc"), abs=2e-6)
    # target-like doc must outscore the raw-only doc
    assert r10["weight"] > r11["weight"]
    # empty doc: zero grams, null weight
    assert got[12]["n_grams"] == 0 and got[12]["weight"] is None


def test_dsir_resample_deterministic_and_weight_driven(spark):
    rows = [(i, 0.0) for i in range(50)] + [(99, 50.0)]
    w = spark.createDataFrame(rows, "doc_id long, weight double")
    pick = lambda: sorted(  # noqa: E731
        r["doc_id"] for r in dsir_resample(w, 5, weight_col="weight").collect()
    )
    a, b = pick(), pick()
    assert a == b and len(a) == 5
    # weight 50 dominates any Gumbel draw (support ~[-2, 5] at n=51)
    assert 99 in a


def test_dsir_resample_excludes_null_weights_and_validates_k(spark):
    w = spark.createDataFrame(
        [(1, None), (2, 1.0)], "doc_id long, weight double"
    )
    got = dsir_resample(w, 5).collect()
    assert [r["doc_id"] for r in got] == [2]
    with pytest.raises(ValueError):
        dsir_resample(w, 0)


def test_dsir_resample_quoted_salt(spark):
    # column-API construction: a salt carrying a quote must not break
    # plan building (the earlier f-string SQL raised ParseException)
    w = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "doc_id long, weight double"
    )
    got = dsir_resample(w, 2, weight_col="weight", salt="wave's-seed")
    assert len(got.collect()) == 2
