"""fastText-style hashed linear quality classifier + CCNet-style
per-language score-tertile bucketing — the two curation steps a webtext
pretraining pipeline runs between crawling and training (CCNet's
"keep the Wikipedia-like head", FineWeb-Edu's classifier-score filter).

Model = a (bucket, w_milli) table over hashed word n-gram features
(unigrams + bigrams folded into ``n_buckets`` buckets, the same
md5-prefix bucketing as operators/dsir.gram_buckets), i.e. a linear
layer over a hashed bag-of-n-grams — the fastText architecture with the
embedding dimension collapsed to 1, which is what production quality
filters actually deploy (a calibrated linear head). Weights live in
exact integer milli-units so every distributed aggregate is bigint
algebra: partition-order-free, overflow-safe (synthetic |w| ≤ 1999
milli ⇒ a doc needs >4.6e15 grams to wrap bigint), and value-hashable
by the DuckDB gate. The
float probability is a driver-side convenience column derived from the
exact logit and rounded to 6 — the keep/drop DECISION thresholds the
integer logit, never the float.

Reference tie-in: the reference crawler stores raw pages only
(crawldb.sql:43-56, no quality column); this is the selection layer its
corpus feeds, kept engine-side so curation runs where the bytes are.

Scale posture: featurization is pure codegen (split/transform/md5, no
Python anywhere); the model is AT MOST ``n_buckets`` rows regardless of
training scale — bounded-broadcast forever, the whole point of hashed
features; scoring is one explode + broadcast join + one per-doc hash
aggregate with map-side combine (no window, no shuffle of text bytes).
Bucketing reuses stats.disc_quantiles: a histogram aggregate + one
window over DISTINCT scores per language, then a broadcast join of the
per-language cutoff row back onto the scored frame — at 100 TB the
cutoff table has one row per language, the scored frame is never
sorted globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import DEFAULT_BUCKETS, gram_buckets

# weights are ODD milli-units with |w| in [1, 1999]: pmod(h, 1000) is
# uniform over [0, 1000), doubled+1 gives odd magnitudes (never 0, so
# every bucket pulls some direction and odd sums keep ties off the 0
# decision boundary); the next hash bit picks the sign
_W_SPAN = 1000


def synthetic_model(
    spark, n_buckets: int = DEFAULT_BUCKETS, salt: str = "ftq"
) -> DataFrame:
    """Deterministic stand-in model: (bucket, w_milli) for every bucket,
    w_milli = ±odd milli-weight derived from md5(bucket ∥ salt). Real
    deployments replace this with a table of trained weights (the
    contract is just (bucket:long, w_milli:long)); tests and the driver
    query use this so the full scoring path is exercised end-to-end with
    reproducible, engine-replayable weights."""
    h = (
        f"cast(conv(substr(md5(concat(cast(id AS STRING), '{salt}')), 1, 8), "
        f"16, 10) AS BIGINT)"
    )
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        F.expr(
            f"(pmod({h}, {_W_SPAN}) * 2 + 1) "
            f"* (CASE WHEN pmod({h} div {_W_SPAN}, 2) = 0 THEN 1 ELSE -1 END)"
        ).cast("long").alias("w_milli"),
    )


def hashed_linear_scores(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    ns=(1, 2),
    bias_milli: int = 0,
    threshold_micro: int = 0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document with a hashed-bag-of-n-grams linear model.

    logit_micro = bias_milli·1000 + (Σ_grams w_milli[bucket(g)] · 1000)
    div n_grams — i.e. the fastText mean-of-features dot product, held
    in exact integer micro-units (Spark's `div` and DuckDB's `//` both
    truncate toward zero, so the oracle replays it exactly).

    Returns (id_col, n_grams, sum_w_milli, logit_micro, keep, prob):
    the first four are exact bigints, ``keep`` = logit_micro ≥
    threshold_micro (docs with zero grams score null logit and keep =
    false), ``prob`` = round(sigmoid(logit_micro/1e6), 6) — a display
    convenience OUTSIDE the exact contract (its last ulp is a single
    float op from an exact integer, but cross-engine exp() may differ,
    so hash gates project it away).
    """
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(gram_buckets(text_col, n_buckets, ns)).alias("bucket"),
    )
    m = F.broadcast(model) if broadcast_model else model
    joined = grams.join(m, "bucket", "left").select(
        "_id", F.coalesce("w_milli", F.lit(0).cast("long")).alias("w_milli")
    )
    per_doc = joined.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum("w_milli").cast("long").alias("sum_w_milli"),
    )
    logit = F.expr(
        f"{int(bias_milli)} * 1000 + (sum_w_milli * 1000) div n_grams"
    ).cast("long")
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("sum_w_milli", F.lit(0).cast("long"))
            .alias("sum_w_milli"),
            F.when(F.col("n_grams") > 0, logit).alias("logit_micro"),
        )
        .withColumn(
            "keep",
            F.coalesce(
                F.col("logit_micro") >= F.lit(int(threshold_micro)),
                F.lit(False),
            ),
        )
        .withColumn(
            "prob",
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-F.col("logit_micro") / F.lit(1e6))),
                6,
            ),
        )
    )


def score_tertile_buckets(
    scored: DataFrame,
    score_col: str = "logit_micro",
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing of an exact integer score
    per language group: cutoffs are the per-group discrete tertiles
    (percentile_disc at 1/3 and 2/3 — smallest score whose cumulative
    count ≥ ceil(p·n), deterministic under ties), head = score ≤ t1,
    middle = score ≤ t2, tail = rest. CCNet buckets on LM perplexity
    where LOWER is better; pass any "lower is better" integer score
    (for the linear classifier above, negate the logit first or read
    head as "highest-scoring third").

    Returns (id_col, group_col, score_col, bucket). Null scores
    (gramless docs) land in 'tail'.

    Scale posture: disc_quantiles aggregates to a per-(group, distinct
    score) histogram before its one window pass, and the cutoff table
    (one row per group) joins back via broadcast — no global sort, no
    per-row window over the corpus.
    """
    from .stats import disc_quantiles, quantile_col_name

    # exact tertiles: ceil(n/3) / ceil(2n/3) ranks (1/3 and 2/3 as
    # doubles sit just under the true ratios, so ceil(p*n) lands
    # exactly at ceil(n/3)/ceil(2n/3) for every n — approximations
    # like 0.34/0.67 systematically over-fill the head)
    ps = (1 / 3, 2 / 3)
    cuts = disc_quantiles(
        scored.filter(F.col(score_col).isNotNull()),
        [group_col],
        score_col,
        ps=ps,
    ).select(
        F.col(group_col).alias("_g"),
        F.col(quantile_col_name(ps[0])).alias("_t1"),
        F.col(quantile_col_name(ps[1])).alias("_t2"),
    )
    # null-safe group join: groupBy keeps a null-group cutoff row, and
    # an equi-join would drop it — silently bucketing every
    # null-group doc 'tail' regardless of score
    joined = scored.join(
        F.broadcast(cuts),
        F.col(group_col).eqNullSafe(F.col("_g")),
        "left",
    )
    return joined.select(
        id_col,
        group_col,
        score_col,
        F.when(F.col(score_col).isNull(), F.lit("tail"))
        .when(F.col(score_col) <= F.col("_t1"), F.lit("head"))
        .when(F.col(score_col) <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
