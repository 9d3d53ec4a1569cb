"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed n-gram features, the standard recipe for
steering a raw web crawl toward a target distribution (e.g. "select
Common-Crawl pages that look like Wikipedia") before pretraining.

Pipeline: (1) featurize every document as a BAG of hashed word
n-grams (unigrams + bigrams folded into ``n_buckets`` hash buckets);
(2) fit smoothed bucket distributions on a TARGET corpus and the RAW
corpus; (3) per-document importance weight = sum over the doc's grams
of log(p_target(bucket) / p_raw(bucket)); (4) resample k documents
with Gumbel-top-k on the weights (sampling without replacement
proportional to softmax(weight), Vieira 2014) — deterministic here via
hash-derived uniforms, so reruns pick the identical set.

Hash/oracle posture: gram -> bucket uses the engine's standard
md5-prefix trick (``conv(substr(md5(g),1,8),16,10) % B`` — DuckDB
replays it as ``('0x' || substr(md5(g),1,8))::BIGINT % B``), and the
hash-gated outputs are exact integers (gram counts, summed bucket
counts, unseen-bucket counts); the float log-weight itself follows the
unigram_nll convention — grouped by distinct (t_cnt, r_cnt) pairs
before the float sum so aggregation order can't move it, rounded to 6,
and pytest-verified rather than value-hashed.

Scale posture: featurization is pure codegen (split/transform/md5 —
no Python); the fitted distribution is AT MOST ``n_buckets`` rows
regardless of corpus size — that bound is the whole point of hashed
features, it keeps the scoring join broadcastable at 100 TB; scoring
is one explode + broadcast join + per-doc hash aggregate (no window,
no shuffle of text); resampling is a TakeOrdered top-k, never a global
sort. Reference tie-in: the reference crawler stores raw pages only
(crawldb.sql:43-56); selection like this is what its corpus would feed
downstream.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_ngrams_sql

DEFAULT_BUCKETS = 10_000


def gram_buckets(col: str, n_buckets: int = DEFAULT_BUCKETS, ns=(1, 2)):
    """array<long> of hash buckets for the doc's word n-grams (bag —
    duplicates preserved), sizes in ``ns``, folded mod ``n_buckets``.
    Pure codegen."""
    parts = [
        f"transform({word_ngrams_sql(col, n)}, "
        f"g -> pmod(cast(conv(substr(md5(g), 1, 8), 16, 10) AS BIGINT), "
        f"{n_buckets}))"
        for n in ns
    ]
    if len(parts) == 1:
        return F.expr(parts[0])
    return F.expr(f"concat({', '.join(parts)})")


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, ns
) -> DataFrame:
    return (
        df.select(
            F.explode(gram_buckets(text_col, n_buckets, ns)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    ns=(1, 2),
) -> DataFrame:
    """Fit the two hashed-gram distributions. Returns
    (bucket, t_cnt, r_cnt) for every bucket seen in EITHER corpus —
    bounded by ``n_buckets`` rows, broadcastable forever."""
    t = _bucket_counts(target, text_col, n_buckets, ns).withColumnRenamed(
        "cnt", "t_cnt"
    )
    r = _bucket_counts(raw, text_col, n_buckets, ns).withColumnRenamed(
        "cnt", "r_cnt"
    )
    return t.join(r, "bucket", "full").select(
        "bucket",
        F.coalesce("t_cnt", F.lit(0)).cast("long").alias("t_cnt"),
        F.coalesce("r_cnt", F.lit(0)).cast("long").alias("r_cnt"),
    )


def dsir_weights(
    df: DataFrame,
    fit: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    ns=(1, 2),
) -> DataFrame:
    """Per-document importance statistics against a ``dsir_fit`` table:
    (id, n_grams, sum_t_cnt, sum_r_cnt, n_unseen_t, weight) where
    weight = Σ_grams [ln((t_cnt+1)/(Nt+B)) − ln((r_cnt+1)/(Nr+B))]
    (add-one smoothed; docs with no grams get weight null). Integer
    columns are exact and hash-gateable; weight is order-stabilized
    (summed over distinct (t_cnt, r_cnt) pairs with exact integer
    multiplicities) and rounded to 6.

    The two normalizer scalars (Nt+B, Nr+B) come off one 1-row
    aggregate — a bounded driver step, same convention as
    text.unigram_nll. The fit table is persisted first: its lineage is
    two full-corpus explodes, and it feeds BOTH the totals aggregate
    and the scoring join — without the persist the corpus would be
    featurized five times per scoring run instead of three (measured
    at sf0.1: 34 s -> ~20 s). It is at most ``n_buckets`` rows, so the
    cache cost is nil; it stays pinned for reuse across scoring calls
    (the fit table is the model)."""
    fit = fit.persist()
    totals = fit.agg(
        F.sum("t_cnt").alias("nt"), F.sum("r_cnt").alias("nr")
    ).collect()[0]
    log_zt = math.log(int(totals["nt"] or 0) + n_buckets)
    log_zr = math.log(int(totals["nr"] or 0) + n_buckets)

    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(gram_buckets(text_col, n_buckets, ns)).alias("bucket"),
    )
    joined = grams.join(F.broadcast(fit), "bucket", "left").select(
        "_id",
        F.coalesce("t_cnt", F.lit(0)).cast("long").alias("t_cnt"),
        F.coalesce("r_cnt", F.lit(0)).cast("long").alias("r_cnt"),
    )
    by_pair = joined.groupBy("_id", "t_cnt", "r_cnt").agg(
        F.count(F.lit(1)).alias("m")
    )
    per_doc = by_pair.groupBy("_id").agg(
        F.sum("m").cast("long").alias("n_grams"),
        F.sum(F.col("t_cnt") * F.col("m")).cast("long").alias("sum_t_cnt"),
        F.sum(F.col("r_cnt") * F.col("m")).cast("long").alias("sum_r_cnt"),
        F.sum(F.when(F.col("t_cnt") == 0, F.col("m")).otherwise(0))
        .cast("long").alias("n_unseen_t"),
        F.sum(
            (
                F.log((F.col("t_cnt") + 1).cast("double")) - F.lit(log_zt)
                - F.log((F.col("r_cnt") + 1).cast("double")) + F.lit(log_zr)
            ) * F.col("m")
        ).alias("_w"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("sum_t_cnt", F.lit(0).cast("long")).alias("sum_t_cnt"),
            F.coalesce("sum_r_cnt", F.lit(0).cast("long")).alias("sum_r_cnt"),
            F.coalesce("n_unseen_t", F.lit(0).cast("long"))
            .alias("n_unseen_t"),
            F.round("_w", 6).alias("weight"),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel-top-k importance resampling: draw k documents WITHOUT
    replacement with P(doc) ∝ exp(weight) by ranking
    ``weight + Gumbel(0,1)`` (Vieira 2014). The Gumbel noise derives
    from md5(id ∥ salt) — 60 hash bits to a uniform in (0,1] — so the
    draw is deterministic, partition-independent, and reproducible
    across engines. Docs with null weight (no grams) never qualify.

    Scale posture: one codegen projection + TakeOrdered(k); no global
    sort, no shuffle of the text."""
    if k < 1:
        raise ValueError("dsir_resample needs k >= 1")
    # column-API construction (no f-string SQL): a salt containing a
    # quote, or an id_col needing backquoting, must not break the plan
    digest = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    u = (
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") + F.lit(1)
    ) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    return (
        weights.filter(F.col(weight_col).isNotNull())
        .withColumn("_key", F.col(weight_col) + gumbel)
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(k)
        .drop("_key")
    )
