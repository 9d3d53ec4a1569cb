"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All built-in
``pyspark.sql.functions`` expressions (JVM-side, whole-stage codegen) —
each returns a Column so they compose into any select, and each has an
ANSI-SQL twin in __spark_entry__.oracle_sql for the DuckDB gate.

The reference stores raw text and does its analysis offline in R
(r/loadTime.R, report §4); these operators are the Spark-native
equivalent surface a 100 TB webtext corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small seeded stopword lists (language-ID heuristic: n-gram/stopword
# counting — deliberately SQL-expressible so DuckDB can oracle-check it)
SL_STOPWORDS = ["in", "je", "na", "za", "se", "da", "so", "ki", "pri", "tudi"]
EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count (0 for empty/null-safe trims)."""
    trimmed = F.trim(_c(col))
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: str = "text") -> Column:
    """BPE-ish subword proxy: count of word/number/punct chunks via the
    classic GPT-2 pre-tokenizer-style regex split."""
    return F.size(
        F.regexp_extract_all(
            F.col(col), F.lit(r"[A-Za-zÀ-ſ]+|[0-9]+|[^\sA-Za-z0-9]"), 0
        )
    )


def punct_ratio(col: str = "text") -> Column:
    n_punct = F.length(F.regexp_replace(F.col(col), r"[^.,;:!?]", ""))
    return (n_punct.cast("double") / F.nullif(F.length(F.col(col)).cast("double"), F.lit(0.0)))


def upper_ratio(col: str = "text") -> Column:
    n_upper = F.length(F.regexp_replace(F.col(col), r"[^A-Z]", ""))
    return n_upper.cast("double") / F.nullif(F.length(F.col(col)).cast("double"), F.lit(0.0))


def _stopword_hits(col: str | Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(pat), 0))


def stopword_ratio(col: str = "text", lang: str = "sl") -> Column:
    words = SL_STOPWORDS if lang == "sl" else EN_STOPWORDS
    return _stopword_hits(col, words).cast("double") / F.nullif(
        token_count(col).cast("double"), F.lit(0.0)
    )


def lang_id(col: str = "text") -> Column:
    """Heuristic language ID: more Slovenian stopword hits → 'sl', more
    English → 'en', tie/none → 'unk'."""
    sl = _stopword_hits(col, SL_STOPWORDS)
    en = _stopword_hits(col, EN_STOPWORDS)
    return (
        F.when(sl > en, F.lit("sl")).when(en > sl, F.lit("en")).otherwise(F.lit("unk"))
    )


def quality_score(col: str = "text") -> Column:
    """Composite [0,1] quality score: length sweet-spot + punctuation
    sanity + stopword presence (the C4/Gopher-style cheap filters)."""
    length = F.length(F.col(col)).cast("double")
    len_ok = F.when((length >= 50) & (length <= 20000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(col) <= 0.1, 1.0).otherwise(0.0)
    stop_ok = F.when(
        (stopword_ratio(col, "sl") > 0.0) | (stopword_ratio(col, "en") > 0.0), 1.0
    ).otherwise(0.0)
    return (len_ok + punct_ok + stop_ok) / F.lit(3.0)


def fingerprint(col: str = "text") -> Column:
    """Deterministic 16-hex-char document fingerprint over normalized
    text (lowercased, whitespace-collapsed) — md5-prefix based so the
    DuckDB oracle can reproduce it exactly."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")
    return F.substring(F.md5(norm), 1, 16)


def rolling_fingerprints(col: str = "text", window: int = 32, stride: int = 16) -> Column:
    """Winnowing-style rolling fingerprints: md5 of each stride-aligned
    character window over normalized text (array<string>). Used for
    partial-overlap detection; not SQL-oracled (array construction).

    The normalized text is bound once per row through the 1-element
    transform wrapper (same fix as word_ngrams_sql): inlining the
    regexp_replace into the per-window lambda re-normalized the WHOLE
    document at every window position — O(positions × doc_len) regexp
    work, ruinous on large web pages."""
    return F.element_at(
        F.expr(
            f"transform(array({_norm_sql(col)}), t -> "
            f"transform(sequence(1, greatest(1, length(t) - {window - 1}), "
            f"{stride}), "
            f"i -> substring(md5(substring(t, i, {window})), 1, 8)))"
        ),
        1,
    )


def _norm_sql(col: str) -> str:
    return f"regexp_replace(trim(lower({col})), '\\\\s+', ' ')"


# --------------------------------------------------- repetition / PII ops

# PII patterns shared by the Spark and DuckDB sides (Java regex and RE2
# agree on this subset: classes, bounded repeats, no backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 ()./-]{6,}[0-9]"


def _sentences(col: str) -> Column:
    parts = F.split(F.lower(F.col(col)), r"\.\s+")
    return F.filter(parts, lambda s: F.length(F.trim(s)) > 0)


def dup_line_ratio(col: str = "text") -> Column:
    """Within-document repetition: share of duplicate sentences
    (Gopher-style repetition filter signal). 0 for empty docs."""
    s = _sentences(col)
    n = F.size(s).cast("double")
    return F.when(
        n > 0, (n - F.size(F.array_distinct(s)).cast("double")) / n
    ).otherwise(F.lit(0.0))


def dup_word_ratio(col: str = "text") -> Column:
    """Share of duplicate word occurrences (lowercased whitespace
    tokens). 0 for empty docs."""
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    n = F.size(words).cast("double")
    return F.when(
        (F.length(F.trim(F.col(col))) > 0) & (n > 0),
        (n - F.size(F.array_distinct(words)).cast("double")) / n,
    ).otherwise(F.lit(0.0))


def email_count(col: str = "text") -> Column:
    return F.size(F.regexp_extract_all(F.col(col), F.lit(EMAIL_RE), 0))


def phone_count(col: str = "text") -> Column:
    return F.size(F.regexp_extract_all(F.col(col), F.lit(PHONE_RE), 0))


def redact_pii(col: str = "text") -> Column:
    """Mask emails then phone-number-shaped digit runs — the cheap
    regex tier of a PII scrub (entity-model tiers plug in behind the
    same column contract). Pure JVM regexp_replace: codegen, no UDF."""
    no_mail = F.regexp_replace(F.col(col), EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_mail, PHONE_RE, "<PHONE>")


def quality_gates_passed(col: str = "text") -> Column:
    """Integer 0..3 count of passed quality gates — the exact-arithmetic
    twin of quality_score for AGGREGATION (summing the float score is
    order-dependent at the 16th digit; summing this int is exact)."""
    length = F.length(F.col(col)).cast("double")
    len_ok = ((length >= 50) & (length <= 20000)).cast("int")
    punct_ok = F.coalesce((punct_ratio(col) <= 0.1).cast("int"), F.lit(0))
    stop_ok = (
        (stopword_ratio(col, "sl") > 0.0) | (stopword_ratio(col, "en") > 0.0)
    ).cast("int")
    return len_ok + punct_ok + F.coalesce(stop_ok, F.lit(0))


# ------------------------------------------------- main-content extraction

# jusText-style block classifier thresholds (deterministic constants,
# shared with the DuckDB oracle replay in __spark_entry__)
BLOCK_MIN_TOKENS = 4       # fewer words than this -> boilerplate outright
BLOCK_GOOD_STOP = 0.30     # stopword density for standalone "good"
BLOCK_NEAR_STOP = 0.15     # density for "near-good" (rescuable by context)
BLOCK_GOOD_LEN = 40        # min chars for standalone "good"


def classify_blocks(blocks: Column) -> Column:
    """Per-block boilerplate labels, array<string> of 'good'/'near'/'bad'
    (pre-smoothing). Re-derivation of the published jusText block
    heuristic (Pomikalek 2011): prose carries function words, chrome
    (nav bars, cookie banners, footers) doesn't —
      bad  : < BLOCK_MIN_TOKENS words
      good : stopword density >= BLOCK_GOOD_STOP and len >= BLOCK_GOOD_LEN
      near : density >= BLOCK_NEAR_STOP (headline-length prose)
      bad  : otherwise.
    Pure codegen (one regexp pass per block); no UDF, no shuffle."""
    def lab(b: Column) -> Column:
        toks = token_count(b)
        dens = _stopword_hits(b, SL_STOPWORDS + EN_STOPWORDS).cast(
            "double"
        ) / F.nullif(toks.cast("double"), F.lit(0.0))
        return (
            F.when(toks < BLOCK_MIN_TOKENS, F.lit("bad"))
            .when(
                (dens >= BLOCK_GOOD_STOP) & (F.length(b) >= BLOCK_GOOD_LEN),
                F.lit("good"),
            )
            .when(dens >= BLOCK_NEAR_STOP, F.lit("near"))
            .otherwise(F.lit("bad"))
        )

    return F.transform(blocks, lab)


def extract_main_text(
    df: DataFrame,
    blocks_col: str = "blocks",
    delim: str = "\n\n",
) -> DataFrame:
    """Main-content extraction (boilerplate removal) over pre-split text
    blocks: classify each block (classify_blocks), then one smoothing
    pass promotes 'near' blocks adjacent to an originally-'good'
    neighbor (prose interrupted by a short paragraph), and the main text
    is the ordered join of the good blocks. The reference stores whole
    raw pages (CrawlerDIO.scala:60-71) and never separates article from
    chrome; an LLM corpus built from those pages needs exactly this pass.

    Smoothing reads the PRE-smoothing labels (single pass, no fixpoint):
    iterated propagation would make the label of block i depend on how
    far a good-run is, which differs under block re-chunking — one pass
    keeps the operator deterministic and cheap.

    Adds columns: n_blocks, n_good, main_text. Per-row array work only —
    no shuffle, no UDF; labels land in real columns so codegen binds
    them once per row instead of re-deriving the label array at each of
    the smoothing pass's O(n_blocks) references."""
    blocks = F.col(blocks_col)
    out = df.withColumn("_labels0", classify_blocks(blocks))
    lab0 = F.col("_labels0")

    def smooth(i: Column) -> Column:
        # neighbor lookups must be CASE-guarded, not try_element_at:
        # under ANSI (the session default) element_at AND try_element_at
        # both throw INVALID_INDEX_OF_ZERO for index 0, so a 'near'
        # FIRST block would kill the job; CASE branches evaluate lazily
        prev = F.when(i > 1, F.element_at(lab0, i - 1))
        nxt = F.when(i < F.size(lab0), F.element_at(lab0, i + 1))
        return F.when(
            (F.element_at(lab0, i) == "near")
            & (
                (F.coalesce(prev, F.lit("")) == "good")
                | (F.coalesce(nxt, F.lit("")) == "good")
            ),
            F.lit("good"),
        ).otherwise(F.element_at(lab0, i))

    # empty block arrays: sequence(1, 0) counts DOWN to [1, 0] and the
    # index-0/overrun lookups throw under ANSI — short-circuit to []
    smoothed = F.when(
        F.size(lab0) > 0, F.transform(F.sequence(F.lit(1), F.size(lab0)), smooth)
    ).otherwise(F.array().cast("array<string>"))
    out = out.withColumn("_labels", smoothed)
    kept = F.filter(
        F.zip_with(
            blocks,
            F.col("_labels"),
            lambda b, l: F.when(l == "good", b),
        ),
        lambda b: b.isNotNull(),
    )
    return (
        out.withColumn("n_blocks", F.size(blocks))
        .withColumn(
            "n_good",
            F.size(F.filter(F.col("_labels"), lambda l: l == "good")),
        )
        .withColumn("main_text", F.array_join(kept, delim))
        .drop("_labels0", "_labels")
    )


# ------------------------------------------------------ corpus n-gram stats

def word_ngrams_sql(col: str = "text", n: int = 2) -> str:
    """The raw SQL for word_ngrams — exposed so composers (e.g.
    operators/dsir.gram_buckets) can splice it into larger expressions
    without round-tripping a Column through catalyst's non-reparseable
    pretty-printer.

    The token array is bound ONCE per row through a 1-element
    transform(array(...), w -> ...) wrapper: codegen does not
    common-subexpression-eliminate across lambda calls, so inlining
    split(regexp_replace(...)) into the per-position lambda re-ran the
    regexp + split for EVERY gram position — O(words^2) regexp work per
    document (measured: the sf0.1 explode dropped ~3x when the binding
    landed). ``w`` is a lambda variable, so references to it inside the
    inner lambda are per-row reads, not recomputation.
    """
    norm = _norm_sql(col)
    # sequence(1, 0) would count DOWN ([1,0]) — guard docs shorter than
    # n; split('') yields [''], caught by the single-empty-token clause
    return (
        f"flatten(transform(array(split({norm}, ' ')), w -> "
        f"CASE WHEN size(w) < {n} "
        f"OR (size(w) = 1 AND length(element_at(w, 1)) = 0) "
        f"THEN array() ELSE "
        f"transform(sequence(1, size(w) - {n - 1}), "
        f"i -> array_join(slice(w, i, {n}), ' ')) END))"
    )


def word_ngrams(col: str = "text", n: int = 2) -> Column:
    """array<string> of word n-grams over normalized text (lowercased,
    whitespace-split). Empty array when the doc has fewer than n words.
    Pure codegen (split/sequence/transform/slice) — no UDF."""
    return F.expr(word_ngrams_sql(col, n))


def top_ngrams(
    df, text_col: str = "text", id_col: str = "doc_id", n: int = 2, k: int = 20
):
    """Corpus-level n-gram heavy hitters: the top-k most frequent word
    n-grams with occurrence count and distinct-document count. The
    standard corpus-health probe (boilerplate phrases, template spam,
    contamination candidates) a webtext pipeline runs before training.

    Deterministic: ties broken by ngram text ascending, so the top-k
    set is stable across partitionings and cluster sizes.

    Scale posture: explode → ONE hash aggregate with map-side partial
    combine on uniformly-distributed string keys (no skew salting
    needed: partial aggregation already collapses hot n-grams per task
    before the shuffle), then TakeOrderedAndProject for the top-k —
    never a full global sort. count_distinct(doc) adds the standard
    two-level expand inside the same aggregate; at 100 TB swap it for
    approx_count_distinct if exact doc counts are not required.
    """
    grams = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(word_ngrams(text_col, n)).alias("ngram"),
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.count_distinct("_doc").alias("n_docs"),
        )
        .orderBy(F.col("occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


def distinctive_terms(
    df, text_col: str = "text", id_col: str = "doc_id", k: int = 5
):
    """Top-k most distinctive terms per document — tf-idf re-expressed
    in exact integer arithmetic so every engine ranks identically:
    score_milli = (tf * 1_000_000) div df, ranked (score desc, term
    asc). Floating idf = ln(N/df) would order the same way for fixed N
    (ln is monotone in tf/df), so the integer ratio keeps tf-idf's
    ranking while staying hash-stable across engines — the same
    exact-twin trick as quality_gates_passed.

    Scale posture: one explode + TWO hash aggregates with map-side
    combine (doc-term tf, then term df derived from the tf table — the
    tokens are never re-scanned); the df join keys are uniformly-
    distributed terms (AQE broadcasts when the vocab is small); the
    per-doc top-k is one window partitioned by doc over its distinct
    terms, not its token stream. No Python anywhere.
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.split(
                F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "),
                " ",
            )
        ).alias("term"),
    ).filter(F.length("term") > 0)
    tf = words.groupBy("_doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score_milli", F.expr("(tf * 1000000) div df")
    )
    w = Window.partitionBy("_doc").orderBy(
        F.col("score_milli").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("_doc").alias(id_col),
            "term",
            "tf",
            "df",
            "score_milli",
            "rnk",
        )
    )


# ----------------------------------------------------- unigram LM scoring

def fit_unigram_freq(df, text_col: str = "text"):
    """Corpus unigram table (word, cnt) over normalized tokens — the fit
    half of the CCNet-style LM quality scorer. One explode + one hash
    aggregate with map-side combine; a 100 TB corpus yields a ~10^7-row
    table, comfortably broadcast for the scoring join."""
    words = df.select(
        F.explode(F.split(F.regexp_replace(F.trim(F.lower(F.col(text_col))),
                                           r"\s+", " "), " ")).alias("word")
    ).filter(F.length("word") > 0)
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def unigram_nll(
    df,
    freq,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_freq: bool = True,
):
    """Per-document unigram negative log-likelihood (the cheap stand-in
    for the KenLM perplexity CCNet buckets a web corpus by): add-one
    smoothed, nll = mean over tokens of -ln((cnt(w)+1) / (N+V)). Lower =
    more corpus-typical text; OOV tokens (scoring corpus B against a
    table fit on corpus A) take cnt 0.

    Returns (id_col, n_tokens, sum_freq, n_oov, nll): the integer
    columns are exact (partition-order-free) and are what the DuckDB
    gate hashes; nll is a float aggregate — the sum runs over the
    distinct-cnt multiset (few terms, each ln value weighted by an exact
    integer multiplicity) so it is far more stable than a per-token sum,
    but its last ulp can still depend on aggregation order, so it is
    rounded to 6 and kept OUT of the hash gate (pytest-verified against
    a Python oracle instead).

    Scale posture: fit side two scalars (N, V) come from one tiny
    aggregate; scoring is explode → broadcast (or shuffle) join on word
    → one hash aggregate per doc. No window, no self-join; the frequency
    table is the only state and it is corpus-vocabulary-sized.
    """
    totals = freq.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_total, vocab = int(totals["n"]), int(totals["v"])
    words = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.split(F.regexp_replace(F.trim(F.lower(F.col(text_col))),
                                     r"\s+", " "), " ")
        ).alias("word"),
    ).filter(F.length("word") > 0)
    f = F.broadcast(freq) if broadcast_freq else freq
    joined = words.join(f, "word", "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
    )
    # group tokens by their cnt first: the float sum then runs over the
    # (few) distinct cnt values weighted by exact integer multiplicities,
    # so partition order cannot reorder it
    by_cnt = joined.groupBy("_id", "cnt").agg(F.count(F.lit(1)).alias("m"))
    per_doc = by_cnt.groupBy("_id").agg(
        F.sum("m").cast("long").alias("n_tokens"),
        F.sum(F.col("cnt") * F.col("m")).cast("long").alias("sum_freq"),
        F.sum(F.when(F.col("cnt") == 0, F.col("m")).otherwise(0))
        .cast("long").alias("n_oov"),
        F.sum(
            -F.log((F.col("cnt") + 1).cast("double")
                   / F.lit(float(n_total + vocab))) * F.col("m")
        ).alias("_nll_sum"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("sum_freq", F.lit(0).cast("long")).alias("sum_freq"),
            F.coalesce("n_oov", F.lit(0).cast("long")).alias("n_oov"),
            F.round(F.col("_nll_sum") / F.col("n_tokens"), 6).alias("nll"),
        )
    )
