"""duplicate_span_stats: exact cross-doc substring duplication — hand
cases, alignment independence, and a pure-Python corpus oracle."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.operators.dedup import duplicate_span_stats

N = 8


def _norm_words(text):
    return " ".join(text.lower().split()).split(" ")


def _py_stats(docs, n=N, min_docs=2):
    grams = {}  # gram -> set(doc)
    pos = {}  # doc -> [gram,...]
    for d, t in docs:
        ws = _norm_words(t)
        gs = (
            []
            if (len(ws) < n or not "".join(ws))
            else [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        )
        pos[d] = gs
        for g in gs:
            grams.setdefault(g, set()).add(d)
    out = {}
    for d, gs in pos.items():
        shared = [len(grams[g]) >= min_docs for g in gs]
        longest = run = 0
        for s in shared:
            run = run + 1 if s else 0
            longest = max(longest, run)
        out[d] = (
            len(gs),
            sum(shared),
            longest + n - 1 if longest else 0,
        )
    return out


def _collect(df):
    return {
        r["doc_id"]: (r["n_grams"], r["shared_grams"], r["longest_span_words"])
        for r in df.collect()
    }


def test_hand_cases(spark):
    w = lambda a, b: " ".join(f"w{i}" for i in range(a, b))  # noqa: E731
    shared_run = w(100, 112)  # 12 words repeated verbatim across docs
    docs = [
        (1, w(0, 20) + " " + shared_run),  # run at the tail
        (2, shared_run + " " + w(200, 230)),  # run at the head (misaligned)
        (3, w(300, 340)),  # fully unique
        (4, "only five words here now"),  # < n words → zero grams
        (5, ""),  # empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _collect(duplicate_span_stats(df))
    exp = _py_stats(docs)
    assert got == exp
    # the 12-word run yields 12-8+1=5 shared gram positions and a
    # 5+8-1=12-word longest span, in BOTH docs despite different offsets
    assert got[1][1] == 5 and got[1][2] == 12
    assert got[2][1] == 5 and got[2][2] == 12
    assert got[3] == (40 - N + 1, 0, 0)
    assert got[4] == (0, 0, 0) and got[5] == (0, 0, 0)


def test_within_doc_repeat_is_not_cross_doc(spark):
    # the same 10-word run twice in ONE doc: distinct-doc count stays 1
    run = " ".join(f"r{i}" for i in range(10))
    docs = [(1, run + " xx yy zz " + run), (2, "a b c d e f g h i j")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _collect(duplicate_span_stats(df))
    assert got[1][1] == 0 and got[1][2] == 0


def test_corpus_python_oracle(spark, sf_dir):
    docs_df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    docs = [(r["doc_id"], r["text"]) for r in docs_df.collect()]
    got = _collect(duplicate_span_stats(docs_df))
    assert got == _py_stats(docs)


def test_partition_independent(spark):
    run = " ".join(f"s{i}" for i in range(15))
    docs = [(i, run + f" tail{i} " + " ".join(f"t{i}_{j}" for j in range(9)))
            for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = _collect(duplicate_span_stats(df.repartition(1)))
    b = _collect(duplicate_span_stats(df.repartition(13, "text")))
    assert a == b


# ------------------------------------------------- remove_duplicate_spans

def _py_remove(docs, n=N, min_docs=2):
    grams = {}
    toks = {}
    for d, t in docs:
        ws = [w for w in _norm_words(t) if w]
        toks[d] = ws
        for i in range(max(0, len(ws) - n + 1)):
            grams.setdefault(" ".join(ws[i : i + n]), set()).add(d)
    out = {}
    for d, ws in toks.items():
        cov = set()
        for i in range(max(0, len(ws) - n + 1)):
            if len(grams[" ".join(ws[i : i + n])]) >= min_docs:
                cov.update(range(i, i + n))
        kept = [w for i, w in enumerate(ws) if i not in cov]
        out[d] = (" ".join(kept), len(ws), len(ws) - len(kept))
    return out


def test_remove_spans_hand_and_oracle(spark):
    from ieps_crawler_spark.operators.dedup import remove_duplicate_spans

    w = lambda a, b: " ".join(f"w{i}" for i in range(a, b))  # noqa: E731
    shared = w(100, 112)
    docs = [
        (1, w(0, 20) + " " + shared),
        (2, shared + " " + w(200, 230)),
        (3, w(300, 340)),
        (4, "only five words here now"),
        (5, ""),
        (6, shared),  # doc that is ENTIRELY a duplicated span
    ]
    exp = _py_remove(docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
        for r in remove_duplicate_spans(df).collect()
    }
    assert got == exp
    # the duplicated run is gone, unique words survive in order
    assert got[1][0] == w(0, 20)
    assert got[2][0] == w(200, 230)
    assert got[3] == (w(300, 340), 40, 0)
    assert got[6] == ("", 12, 12)


def test_remove_spans_partition_independent(spark):
    from ieps_crawler_spark.operators.dedup import remove_duplicate_spans

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [(i, base + f" unique{i} tail{i}") for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, remove_duplicate_spans(df).collect()))
    b = sorted(
        map(tuple, remove_duplicate_spans(df.repartition(7)).collect())
    )
    assert a == b
    assert a == sorted(
        (i,) + v for i, v in _py_remove(docs).items()
    )
