"""Round-2 corpus-maintenance operators on constructed inputs:
cross-document line dedup (remove_duplicate_lines), n-gram heavy
hitters (top_ngrams), staleness re-crawl scheduling (refresh_schedule).
Each also has a DuckDB oracle in __spark_entry__; these tests pin the
exact per-case semantics a hash comparison cannot explain."""

import datetime as dt

from pyspark.sql import functions as F

from ieps_crawler_spark.operators.dedup import remove_duplicate_lines
from ieps_crawler_spark.operators.politeness import refresh_schedule
from ieps_crawler_spark.operators.text import top_ngrams, word_ngrams


# ------------------------------------------------- remove_duplicate_lines

def _line_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_line_dedup_removes_all_occurrences_case_insensitive(spark):
    df = _line_df(spark, [
        (1, "unique one\nCOOKIE BANNER\nbody a"),
        (2, "cookie banner\nbody b"),
        (3, "body c\n  cookie banner  \nunique three"),
    ])
    out = {r["doc_id"]: r for r in remove_duplicate_lines(df).collect()}
    # normalized (trim+lower) matching: all three variants die
    assert out[1]["text"] == "unique one\nbody a"
    assert out[2]["text"] == "body b"
    assert out[3]["text"] == "body c\nunique three"
    assert all(out[i]["n_removed"] == 1 for i in (1, 2, 3))


def test_line_dedup_blank_lines_never_counted_or_removed(spark):
    df = _line_df(spark, [
        (1, "a\n\nb"),
        (2, "c\n\nd"),
        (3, "e\n \nf"),
    ])
    out = {r["doc_id"]: r for r in remove_duplicate_lines(df).collect()}
    # the blank line appears in all 3 docs but survives everywhere
    assert out[1]["text"] == "a\n\nb"
    assert out[3]["text"] == "e\n \nf"
    assert all(r["n_removed"] == 0 for r in out.values())


def test_line_dedup_min_docs_threshold_and_within_doc_repeats(spark):
    df = _line_df(spark, [
        (1, "x\nx\nx"),   # repeated within ONE doc only
        (2, "y\nz"),
        (3, "z\nw"),
    ])
    out2 = {r["doc_id"]: r for r in remove_duplicate_lines(df, min_docs=2).collect()}
    # x occurs 3 times but in 1 distinct doc -> kept (count is per-DOC)
    assert out2[1]["text"] == "x\nx\nx"
    # z occurs in 2 docs -> removed from both
    assert out2[2]["text"] == "y" and out2[3]["text"] == "w"
    out3 = {r["doc_id"]: r for r in remove_duplicate_lines(df, min_docs=3).collect()}
    assert out3[2]["text"] == "y\nz"  # threshold 3 not met


def test_line_dedup_doc_fully_removed_still_present(spark):
    df = _line_df(spark, [(1, "same"), (2, "same"), (3, "other")])
    out = {r["doc_id"]: r for r in remove_duplicate_lines(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["text"] == "" and out[1]["n_removed"] == 1
    assert out[3]["text"] == "other" and out[3]["n_removed"] == 0


def test_line_dedup_partition_independent(spark):
    rows = [
        (i, f"doc {i} intro\nshared footer line\nbody {i % 4}\ntail {i}")
        for i in range(40)
    ]
    df = _line_df(spark, rows)
    a = sorted(
        (r["doc_id"], r["text"], r["n_removed"])
        for r in remove_duplicate_lines(df).collect()
    )
    b = sorted(
        (r["doc_id"], r["text"], r["n_removed"])
        for r in remove_duplicate_lines(df.repartition(7, "text")).collect()
    )
    assert a == b
    # "shared footer line" (40 docs) and "body k" (10 docs each) die
    assert all(t == f"doc {i} intro\ntail {i}" for (i, t, _) in a)


# ------------------------------------------------------------- top_ngrams

def test_word_ngrams_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "solo"), (3, ""), (4, "  ")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_ngrams("text", 2).alias("g")).collect()
    }
    assert got[1] == ["one two", "two three"]
    assert got[2] == [] and got[3] == [] and got[4] == []


def test_top_ngrams_counts_and_deterministic_ties(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b"),      # "a b" x2, "b a" x1
            (2, "a b c"),        # "a b", "b c"
            (3, "b c"),          # "b c"
        ],
        "doc_id int, text string",
    )
    rows = top_ngrams(df, n=2, k=3).collect()
    assert [(r["ngram"], r["occurrences"], r["n_docs"]) for r in rows] == [
        ("a b", 3, 2),   # most frequent
        ("b c", 2, 2),   # tie on 2 would sort by text; here unique
        ("b a", 1, 1),
    ]


def test_top_ngrams_python_oracle_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["ngram"], r["occurrences"], r["n_docs"])
        for r in top_ngrams(docs, n=3, k=10).collect()
    ]
    # slow exact oracle
    import collections
    import re
    occ = collections.Counter()
    docs_per = collections.defaultdict(set)
    for row in docs.select("doc_id", "text").collect():
        words = re.sub(r"\s+", " ", row["text"].strip().lower()).split(" ")
        for i in range(max(len(words) - 2, 0)):
            g = " ".join(words[i : i + 3])
            occ[g] += 1
            docs_per[g].add(row["doc_id"])
    want = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [(g, c, len(docs_per[g])) for g, c in want]


# ------------------------------------------------------- refresh_schedule

AS_OF = dt.datetime(2019, 6, 1, 0, 0, 0)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, host string, warc_ts timestamp")


def _delays(spark, rows):
    return spark.createDataFrame(rows, "host string, delay_ms long")


def test_refresh_selects_stale_oldest_first_within_budget(spark):
    day = dt.timedelta(days=1)
    pages = _pages(spark, [
        (f"http://h.si/p{i}/", "h.si", AS_OF - (i + 1) * day) for i in range(6)
    ] + [("http://h.si/fresh/", "h.si", AS_OF)])
    # delay 20s, wave 60s -> budget 3
    out = refresh_schedule(
        pages, _delays(spark, [("h.si", 20000)]), AS_OF,
        min_age_seconds=86400, wave_seconds=60,
    ).orderBy("fetch_order").collect()
    assert [r["url"] for r in out] == [
        "http://h.si/p5/", "http://h.si/p4/", "http://h.si/p3/"
    ]  # stalest first, fresh page excluded, budget=3 enforced
    assert [r["fetch_order"] for r in out] == [1, 2, 3]
    # politeness spacing: 20s apart starting at as_of
    assert [(r["sched_ts"] - AS_OF).total_seconds() for r in out] == [0.0, 20.0, 40.0]
    assert out[0]["age_s"] == 6 * 86400


def test_refresh_default_delay_and_min_budget_one(spark):
    pages = _pages(spark, [
        ("http://a.si/x/", "a.si", AS_OF - dt.timedelta(days=2)),
        ("http://a.si/y/", "a.si", AS_OF - dt.timedelta(days=3)),
    ])
    # no delay row -> DEFAULT 4000ms; wave 2s -> budget = max(1, 2000/4000) = 1
    out = refresh_schedule(
        pages, _delays(spark, []), AS_OF, min_age_seconds=0, wave_seconds=2
    ).collect()
    assert len(out) == 1 and out[0]["url"] == "http://a.si/y/"


def test_refresh_tie_break_on_url(spark):
    ts = AS_OF - dt.timedelta(days=1)
    pages = _pages(spark, [
        ("http://b.si/b/", "b.si", ts), ("http://b.si/a/", "b.si", ts),
    ])
    out = refresh_schedule(
        pages, _delays(spark, [("b.si", 30000)]), AS_OF,
        min_age_seconds=0, wave_seconds=60,
    ).orderBy("fetch_order").collect()
    assert [r["url"] for r in out] == ["http://b.si/a/", "http://b.si/b/"]


# -------------------------------------------------------- unigram LM score

def test_unigram_nll_matches_python_oracle(spark):
    import math

    from ieps_crawler_spark.operators.text import fit_unigram_freq, unigram_nll

    fit_rows = [(1, "a a b"), (2, "a c")]
    score_rows = [(10, "a b"), (11, "z z"), (12, "")]
    fit = spark.createDataFrame(fit_rows, "doc_id int, text string")
    sc = spark.createDataFrame(score_rows, "doc_id int, text string")
    freq = fit_unigram_freq(fit)
    out = {r["doc_id"]: r for r in unigram_nll(sc, freq).collect()}
    # corpus: a=3, b=1, c=1 -> N=5, V=3, denom=8
    def nll(cnts):
        return round(sum(-math.log((c + 1) / 8.0) for c in cnts) / len(cnts), 6)

    assert (out[10]["n_tokens"], out[10]["sum_freq"], out[10]["n_oov"]) == (2, 4, 0)
    assert out[10]["nll"] == nll([3, 1])
    # OOV tokens take cnt 0
    assert (out[11]["n_tokens"], out[11]["sum_freq"], out[11]["n_oov"]) == (2, 0, 2)
    assert out[11]["nll"] == nll([0, 0])
    # empty doc: zero tokens, null nll
    assert (out[12]["n_tokens"], out[12]["nll"]) == (0, None)


def test_unigram_nll_partition_independent_integers(spark, sf_dir):
    from ieps_crawler_spark.operators.text import fit_unigram_freq, unigram_nll

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    freq = fit_unigram_freq(docs.filter("doc_id % 2 = 0"))
    a = sorted(
        (r["doc_id"], r["n_tokens"], r["sum_freq"], r["n_oov"])
        for r in unigram_nll(docs, freq).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_tokens"], r["sum_freq"], r["n_oov"])
        for r in unigram_nll(docs.repartition(13), freq, broadcast_freq=False).collect()
    )
    assert a == b and len(a) == docs.count()
