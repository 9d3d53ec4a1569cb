"""Hashed linear quality classifier + CCNet tertile-bucket tests
(operators/classifier.py): synthetic-model weight replay, exact
integer logit vs a Python oracle, keep-threshold semantics, empty-doc
handling, sigmoid convenience column, and per-group tertile bucketing
incl. ties and null scores."""

import hashlib
import math

from pyspark.sql import functions as F

from ieps_crawler_spark.operators.classifier import (
    hashed_linear_scores,
    score_tertile_buckets,
    synthetic_model,
)

B = 97  # small bucket count so hash collisions actually occur


def _py_grams(text, ns=(1, 2)):
    toks = " ".join(text.lower().split()).split(" ") if text.strip() else []
    if toks == [""]:
        toks = []
    out = []
    for n in ns:
        if len(toks) >= n:
            out += [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return out


def _py_bucket(g, b=B):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % b


def _py_weight(bucket, salt="ftq"):
    h = int(hashlib.md5(f"{bucket}{salt}".encode()).hexdigest()[:8], 16)
    return ((h % 1000) * 2 + 1) * (1 if (h // 1000) % 2 == 0 else -1)


def _trunc_div(a, b):
    # Spark `div` / DuckDB `//`: truncation toward zero
    return (abs(a) // b) * (1 if a >= 0 else -1)


def test_synthetic_model_matches_python_replay(spark):
    rows = synthetic_model(spark, n_buckets=B).collect()
    assert len(rows) == B
    for r in rows:
        assert r["w_milli"] == _py_weight(r["bucket"])
        assert 1 <= abs(r["w_milli"]) <= 1999 and r["w_milli"] % 2 != 0


def test_scores_match_python_oracle(spark):
    docs = [
        (1, "the quick brown fox jumps"),
        (2, "the the the"),
        (3, "singleton"),
        (4, "   "),  # whitespace-only: zero grams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in hashed_linear_scores(
            df, synthetic_model(spark, B), n_buckets=B
        ).collect()
    }
    for doc_id, text in docs:
        grams = _py_grams(text)
        r = got[doc_id]
        assert r["n_grams"] == len(grams)
        want_sum = sum(_py_weight(_py_bucket(g)) for g in grams)
        assert r["sum_w_milli"] == want_sum
        if grams:
            want_logit = _trunc_div(want_sum * 1000, len(grams))
            assert r["logit_micro"] == want_logit
            assert r["keep"] == (want_logit >= 0)
            assert r["prob"] == round(
                1.0 / (1.0 + math.exp(-want_logit / 1e6)), 6
            )
        else:
            assert r["logit_micro"] is None and r["keep"] is False


def test_bias_and_threshold(spark):
    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    model = synthetic_model(spark, B)
    base = hashed_linear_scores(df, model, n_buckets=B).collect()[0]
    shifted = hashed_linear_scores(
        df, model, n_buckets=B, bias_milli=7
    ).collect()[0]
    assert shifted["logit_micro"] == base["logit_micro"] + 7000
    strict = hashed_linear_scores(
        df, model, n_buckets=B, threshold_micro=base["logit_micro"] + 1
    ).collect()[0]
    assert strict["keep"] is False
    loose = hashed_linear_scores(
        df, model, n_buckets=B, threshold_micro=base["logit_micro"]
    ).collect()[0]
    assert loose["keep"] is True


def test_tertile_buckets_per_group(spark):
    # en: scores 1..9 -> exact thirds: t1=ceil(9/3)=3, t2=ceil(18/3)=6
    rows = [(i, "en", i) for i in range(1, 10)]
    # sl: constant score -> everything is 'head' (cutoffs collapse)
    rows += [(100 + i, "sl", 5) for i in range(4)]
    # de: null scores -> 'tail'
    rows += [(200, "de", None), (201, "de", None)]
    # null lang is its own group (null-safe cutoff join), bucketed by
    # its OWN tertiles — not dumped into 'tail'
    rows += [(300, None, 1), (301, None, 2), (302, None, 3)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, logit_micro long"
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_tertile_buckets(df).collect()
    }
    for i in range(1, 10):
        want = "head" if i <= 3 else ("middle" if i <= 6 else "tail")
        assert got[i] == want, (i, got[i])
    assert all(got[100 + i] == "head" for i in range(4))
    assert got[200] == "tail" and got[201] == "tail"
    assert (got[300], got[301], got[302]) == ("head", "middle", "tail")


def test_tertile_buckets_deterministic_under_ties(spark):
    # heavy ties: 6x score 10, 3x score 20 -> n=9, t1 = smallest v with
    # cum>=3 -> 10, t2 = smallest v with cum>=6 -> ALSO 10 (the head
    # tie-block swallows the middle cutoff), so the 20s are 'tail'
    rows = [(i, "en", 10) for i in range(6)] + [
        (10 + i, "en", 20) for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, logit_micro long"
    )
    got = {r["doc_id"]: r["bucket"] for r in score_tertile_buckets(df).collect()}
    assert all(got[i] == "head" for i in range(6))
    assert all(got[10 + i] == "tail" for i in range(3))


def test_no_python_stages_in_score_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        hashed_linear_scores(df, synthetic_model(spark, B), n_buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "CartesianProduct" not in plan
