"""Repetition / PII-redaction / decontamination operators on constructed
inputs (the synthetic documents table exercises parity via the DuckDB
gate; these pin exact behavior on strings that actually contain PII,
repeats, and shared n-grams)."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.operators.text import (
    dup_line_ratio,
    dup_word_ratio,
    email_count,
    phone_count,
    quality_gates_passed,
    quality_score,
    redact_pii,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_redact_pii_masks_emails_and_phones(spark):
    t = "write to John.Doe+x@exam-ple.org or call +386 1 234 5678 today"
    assert _one(spark, t, email_count("text")) == 1
    assert _one(spark, t, phone_count("text")) == 1
    red = _one(spark, t, redact_pii("text"))
    assert red == "write to <EMAIL> or call <PHONE> today"


def test_redact_pii_no_false_hits(spark):
    t = "version 1.2 costs 12 eur at 3pm"
    assert _one(spark, t, email_count("text")) == 0
    assert _one(spark, t, phone_count("text")) == 0
    assert _one(spark, t, redact_pii("text")) == t


def test_dup_ratios(spark):
    # 4 sentences, one repeated once -> 1/4 dup; 8 words, "eno malo"
    # repeated -> 3 dup occurrences of 8 total
    t = "Eno malo besedilo. Drugo besedilo. Eno malo besedilo. Tretje."
    assert _one(spark, t, dup_line_ratio("text")) == pytest.approx(0.25)
    t2 = "a b c a b a d a"
    assert _one(spark, t2, dup_word_ratio("text")) == pytest.approx(0.5)
    assert _one(spark, "", dup_line_ratio("text")) == 0.0
    assert _one(spark, "", dup_word_ratio("text")) == 0.0


def test_quality_gates_exact_twin(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.select(
        quality_gates_passed("text").alias("g"),
        (F.round(quality_score("text") * 3).cast("int")).alias("s3"),
    ).filter(F.col("g") != F.col("s3"))
    assert bad.count() == 0


def test_ngram_contamination_flags_shared_grams(spark):
    from ieps_crawler_spark.operators.dedup import ngram_contamination

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [
            (1, "he saw the quick brown fox jumps away fast"),  # shares 5-gram
            (2, "completely unrelated text with no overlap at all"),
            (3, "quick brown fox jumps over and over again"),  # shares 5-gram
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_eval_hits"], r["contaminated"])
        for r in ngram_contamination(tr, ev, n=5).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3][1] is True and got[3][0] >= 1
    assert len(got) == 3  # every train row present


# ---------------------------------------------------- distinctive_terms

def _py_distinctive(docs, k=5):
    from collections import Counter

    tfs = {d: Counter(" ".join(t.lower().split()).split()) for d, t in docs}
    for d in tfs:
        tfs[d] = Counter({w: c for w, c in tfs[d].items() if w})
    dfreq = Counter()
    for c in tfs.values():
        dfreq.update(c.keys())
    out = {}
    for d, c in tfs.items():
        rows = sorted(
            ((t, tf, dfreq[t], tf * 1_000_000 // dfreq[t]) for t, tf in c.items()),
            key=lambda r: (-r[3], r[0]),
        )[:k]
        out[d] = [(t, tf, df_, s, i + 1) for i, (t, tf, df_, s) in enumerate(rows)]
    return out


def test_distinctive_terms_python_oracle(spark):
    from ieps_crawler_spark.operators.text import distinctive_terms

    docs = [
        (1, "apple apple banana common common common"),
        (2, "banana cherry common common zebra zebra zebra"),
        (3, "common plain words apple"),
        (4, ""),
    ]
    exp = _py_distinctive(docs, k=3)
    got = {}
    for r in distinctive_terms(
        spark.createDataFrame(docs, "doc_id long, text string"), k=3
    ).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["df"], r["score_milli"], r["rnk"])
        )
    for d in got:
        got[d].sort(key=lambda t: t[4])
    assert got == {d: v for d, v in exp.items() if v}
    # rare repeated term outranks the ubiquitous one
    assert got[2][0][0] == "zebra"
    assert all(t[0] != "common" or t[4] > 1 for t in got[2])


def test_distinctive_terms_partition_independent(spark):
    from ieps_crawler_spark.operators.text import distinctive_terms

    docs = [(i, f"shared words everywhere plus unique{i % 7} rare{i}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, distinctive_terms(df, k=4).collect()))
    b = sorted(map(tuple, distinctive_terms(df.repartition(9), k=4).collect()))
    assert a == b
