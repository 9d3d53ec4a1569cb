"""Vocab-driven greedy subword tokenizer (VERDICT r2 task 7 — the
realism tier above the bpe_ish regex proxy). Deterministic given the
vendored vocab; replayable in SQL (driver oracle text_bpe_tokens)."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.functions.tokenizer import (
    DEFAULT_VOCAB,
    greedy_bpe_token_counts,
    greedy_token_count,
)


def test_kernel_greedy_longest_match():
    vocab = frozenset(["a", "b", "c", "ab", "abc", "bc"])
    # longest match wins at each position, left to right
    assert greedy_token_count("abc", vocab, 3) == 1
    assert greedy_token_count("abab", vocab, 3) == 2
    assert greedy_token_count("abcbc", vocab, 3) == 2  # abc + bc
    # greedy is not optimal — 'ab' then 'c...' vs 'a' 'bc': greedy takes ab
    assert greedy_token_count("abca", vocab, 3) == 2  # abc + a
    # unknown char: advance 1, count 1
    assert greedy_token_count("axb", vocab, 3) == 3
    assert greedy_token_count("", vocab, 3) == 0


def test_default_vocab_covers_ascii_singletons():
    v = frozenset(DEFAULT_VOCAB)
    for ch in "abcdefghijklmnopqrstuvwxyz0123456789.,;:!?'\"-":
        assert ch in v, ch
    # merges compress real words below their character count
    mx = max(len(t) for t in v)
    assert greedy_token_count("the", v, mx) == 1
    assert greedy_token_count("nation", v, mx) < 6


def test_dataframe_counts_match_kernel(spark):
    docs = spark.createDataFrame(
        [
            (0, "The nation, and THE stations!"),
            (1, ""),
            (2, "uprava za varnost pri delu"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_tokens"])
        for r in greedy_bpe_token_counts(docs).collect()
    }
    import re

    v = frozenset(DEFAULT_VOCAB)
    mx = max(len(t) for t in v)
    pat = re.compile(r"[a-zà-ſ]+|[0-9]+|[^\sa-z0-9]")
    for doc_id, text in [(0, "The nation, and THE stations!"),
                         (1, ""), (2, "uprava za varnost pri delu")]:
        chunks = pat.findall(text.lower())
        want = (len(chunks),
                sum(greedy_token_count(c, v, mx) for c in chunks))
        assert got[doc_id] == want, doc_id
    assert got[3] == (0, 0)  # null text -> zero counts, row kept


def test_partition_independent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(map(tuple, greedy_bpe_token_counts(docs).collect()))
    b = sorted(
        map(tuple, greedy_bpe_token_counts(docs.repartition(13)).collect())
    )
    assert a == b


def test_packing_with_real_token_counts(spark, sf_dir):
    """pack_sequences consumes the greedy counts as its token column —
    the curation -> assembly handoff the realism tier exists for."""
    from ieps_crawler_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    toks = greedy_bpe_token_counts(docs)
    packed = pack_sequences(
        toks, id_col="doc_id", tokens_col="n_tokens", budget=512, shards=4
    )
    rows = packed.collect()
    assert len(rows) == toks.count()
    # layout invariant: within a shard, offsets advance by token counts
    tk = {r["doc_id"]: r for r in toks.collect()}
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        c = by_shard.get(r["shard"], 0)
        assert r["seq_id"] == c // 512 and r["offset"] == c % 512, r
        by_shard[r["shard"]] = c + tk[r["doc_id"]]["n_tokens"]
