"""Vocab-driven greedy subword tokenizer (the realism tier above
operators.text.bpe_ish_token_count's regex proxy).

Greedy longest-match against a fixed subword vocabulary — the
WordPiece-family decode rule, deterministic given the vocab, and (unlike
merge-ranked BPE) exactly replayable by a SQL engine: the DuckDB oracle
walks each chunk with a recursive CTE taking the longest vocab prefix at
every position (``__spark_entry__.oracle_sql()['text_bpe_tokens']``).

Pipeline contract: same text columns as bpe_ish_token_count, but
returned as a DataFrame op (``greedy_bpe_token_counts``) because the
scale-shaped plan needs a join:

1. pre-tokenize to word/number/punct chunks (JVM regexp, the same
   pattern family as bpe_ish_token_count) and explode;
2. tokenize each DISTINCT chunk string once in an Arrow-batched pandas
   UDF — webtext chunk frequencies are Zipfian, so distinct chunks are
   orders of magnitude fewer than total chunks and the Python loop cost
   is O(vocabulary), not O(corpus);
3. join the per-chunk counts back and sum per document (docs with no
   chunks keep n_tokens = 0 via the left join).

The vendored DEFAULT_VOCAB (single chars + digits + punctuation +
English/Slovene merges, matching the reference's gov.si corpus flavor)
makes every char matchable, so the unknown-char fallback (advance 1,
count 1) only fires on unlisted non-ASCII codepoints — identically in
Python and DuckDB, both of which index strings by codepoint.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Explicit whitespace class, NOT \s: the pattern is evaluated by BOTH
# Java regex (Spark) and RE2 (the DuckDB oracle), and the engines
# disagree on \s at the edges (Java's \s includes \x0b, RE2's does
# not), which would make a document containing a vertical tab tokenize
# differently per engine and fail the oracle hash.
_WS = "\\t\\n\\x0b\\f\\r "
CHUNK_PATTERN = rf"[a-zà-ſ]+|[0-9]+|[^{_WS}a-z0-9]"

_MERGES = [
    # frequent English pieces
    "the", "and", "ing", "ion", "tion", "er", "re", "on", "at", "en",
    "ed", "es", "an", "in", "is", "it", "or", "ar", "al", "le", "se",
    "st", "ne", "de", "to", "of", "he", "nd", "ha", "ce", "ta", "ur",
    "te", "ri", "ro", "li", "ra", "be", "co", "me", "di", "ve", "ow",
    "us", "we", "ent", "ati", "ous", "ble", "men", "con", "ter", "com",
    # frequent Slovene pieces (gov.si corpus flavor)
    "da", "je", "na", "za", "ki", "pri", "tudi", "so", "va", "po",
    "pre", "do", "ja", "ni", "sta", "nja", "ega", "ih", "em", "om",
    "anje", "enje", "ost", "stv", "prav", "slo", "ven", "nje", "ske",
]

DEFAULT_VOCAB: tuple[str, ...] = tuple(
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)]
    + list(".,;:!?()[]{}'\"-/\\&%+*=<>@#_|~^$")
    + _MERGES
)


def greedy_token_count(text: str, vocab: frozenset, max_len: int) -> int:
    """Pure-Python greedy longest-match count for one chunk — the
    single-chunk kernel the pandas UDF maps; also the unit-test oracle."""
    pos, n, length = 0, 0, len(text)
    while pos < length:
        step = 1
        for l in range(min(max_len, length - pos), 0, -1):
            if text[pos : pos + l] in vocab:
                step = l
                break
        n += 1
        pos += step
    return n


def greedy_count_udf(vocab: Iterable[str] = DEFAULT_VOCAB):
    """Arrow-batched chunk -> token-count UDF over a frozen vocab."""
    vset = frozenset(vocab)
    max_len = max(len(t) for t in vset)

    @pandas_udf("long")
    def count_tokens(chunks: pd.Series) -> pd.Series:
        return chunks.map(
            lambda c: greedy_token_count(c, vset, max_len)
        ).astype("int64")

    return count_tokens


def greedy_bpe_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: Iterable[str] = DEFAULT_VOCAB,
) -> DataFrame:
    """Per-document greedy-subword token counts over a fixed vocab.
    Returns (id_col, n_chunks, n_tokens) — exact integers.

    Scale posture: the pandas-UDF tokenizer runs once per DISTINCT
    chunk string (Zipfian webtext: distinct ≪ total), everything else
    is JVM-side — regexp explode, hash aggregate on chunk, join counts
    back, sum per doc. The distinct-chunk frame is usually tiny; AQE
    broadcasts the join at runtime, and a skewed super-chunk cannot
    exist (chunks are single words/punct runs)."""
    chunks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(CHUNK_PATTERN), 0
            )
        ).alias("chunk"),
    )
    per_doc_chunk = chunks.groupBy(id_col, "chunk").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    uniq = per_doc_chunk.select("chunk").distinct()
    counted = uniq.withColumn("toks", greedy_count_udf(vocab)("chunk"))
    summed = (
        per_doc_chunk.join(counted, "chunk")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("long").alias("n_chunks"),
            F.sum(F.col("n_occ") * F.col("toks")).cast("long").alias("n_tokens"),
        )
    )
    return df.select(id_col).join(summed, id_col, "left").select(
        id_col,
        F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
    )
