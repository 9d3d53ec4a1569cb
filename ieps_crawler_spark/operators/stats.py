"""Corpus-statistics operators — cardinality sketches and exact
distribution quantiles.

Why a crawler/training-data engine needs these: at 10^10-URL frontier
scale the scheduler constantly asks "how many DISTINCT urls does this
host still hold?" and "what does the document-length distribution look
like per language?". Exact count_distinct is a two-level expand that
shuffles every key; a HyperLogLog register table is a few KB per group,
OR-mergeable across waves, and answers the first question at any scale.
The length distribution drives sequence-packing budgets and quality
cutoffs (reference report §4 computes exactly these offline stats in R,
ref: r/loadTime.R, report/report.tex:161-176).

Determinism contract (what lets the DuckDB oracle hash-match): the
sketch here is NOT Spark's approx_count_distinct (whose HLL++ register
layout is engine-private). It is a from-scratch HLL built on md5 —
bucket = first `bucket_hex` hex chars of md5(key), rank = position of
the first 1-bit in the next `rank_hex` hex chars — so ANY ANSI engine
replays it byte-for-byte with substr/translate/replace/strpos. All
aggregation state is integer (max-register, bit-shifted harmonic
numerator); the only float op is one final literal-constant division
per group, which is order-independent and IEEE-identical everywhere.

Scale posture: registers are ONE hash aggregate with map-side partial
combine (max is commutative); the register table is tiny (m rows per
group), merges across waves/sources by groupBy-max (HLL union = OR =
max per bucket), and the estimate step aggregates m rows per group.
Quantiles compress to a (group, value) histogram FIRST — one hash
aggregate — so the window sort that follows orders distinct values,
not rows: a 10^12-row corpus with ~10^4 distinct token lengths sorts
10^4 rows per group, and a skewed group costs its distinct-value
count, never its row count.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hex_bits",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "disc_quantiles",
    "cms_sketch",
    "cms_merge",
    "cms_estimate",
    "hdr_registers",
    "hdr_merge",
    "hdr_estimate",
    "skew_report",
]

# 4-bit patterns per hex digit, applied via translate-to-placeholder +
# 16 replaces (both Spark and DuckDB lack a one-to-many translate).
_HEX = "0123456789abcdef"
_PLACE = "ABCDEFGHIJKLMNOP"
_BITS = {p: format(i, "04b") for i, p in enumerate(_PLACE)}


def hex_bits(col: Column) -> Column:
    """Lowercase-hex string → bit string ('a3' → '10100011'). Pure
    codegen string ops, replayable verbatim in any ANSI engine."""
    out = F.translate(col, _HEX, _PLACE)
    for p, bits in _BITS.items():
        out = F.replace(out, F.lit(p), F.lit(bits))
    return out


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    key_col: str | Column,
    bucket_hex: int = 3,
    rank_hex: int = 12,
) -> DataFrame:
    """Per-group HLL register table: (group…, bucket, register).

    bucket = first `bucket_hex` hex chars of md5(key) → m = 16^bucket_hex
    buckets; register = max over keys of the 1-based position of the
    first 1-bit in the next `rank_hex` hex chars (rank_hex*4 + 1 when
    that slice is all zeros — probability 2^-48 at the default width).
    Only non-empty buckets are materialized; `hll_estimate` accounts
    for the missing ones.
    """
    w = rank_hex * 4
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.md5(key.cast("string"))
    bits = hex_bits(F.substring(h, bucket_hex + 1, rank_hex))
    first_one = F.instr(bits, "1")
    rank = F.when(first_one == 0, F.lit(w + 1)).otherwise(first_one)
    return (
        df.select(
            *group_cols,
            F.substring(h, 1, bucket_hex).alias("bucket"),
            rank.alias("_rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rank").cast("int").alias("register"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union of sketches = per-bucket max. Register tables from
    different waves/sources/partitions merge losslessly — the property
    that makes the sketch incrementally maintainable in the crawl loop
    (append registers per wave, fold with this before estimating)."""
    return regs.groupBy(*group_cols, "bucket").agg(
        F.max("register").alias("register")
    )


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def hll_estimate(
    regs: DataFrame,
    group_cols: list[str],
    bucket_hex: int = 3,
    rank_hex: int = 12,
) -> DataFrame:
    """Collapse a register table to one row per group:

    - ``harm_num``: exact-integer harmonic numerator
      sum(2^(W+1-register)) + (m - observed)·2^(W+1) where W =
      rank_hex·4 — i.e. sum(2^-register) scaled by 2^(W+1) so every
      term is a bigint (register ∈ [1, W+1]); order-independent, so
      hash-stable.
    - ``n_zero_buckets``: buckets never hit (linear-counting signal;
      the small-range corrected estimate ``m·ln(m/zeros)`` is left to
      callers — ln() last-ulp behavior is libm-specific, so it stays
      out of the hashed contract).
    - ``hll_est``: floor(alpha·m²·2^(W+1) / harm_num) — the raw HLL
      estimate. One literal/exact-int double division per group.
    """
    m = 16**bucket_hex
    w = rank_hex * 4
    alpha_num = _alpha(m) * m * m * float(1 << (w + 1))
    # shiftleft's python wrapper wants a literal bit count — go through
    # SQL for the per-row exponent (register ∈ [1, W+1] ⇒ shift ∈ [0, W])
    shifted = F.expr(f"shiftleft(cast(1 as bigint), {w + 1} - register)")
    out = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n_obs"),
        F.sum(shifted).alias("_s_obs"),
    )
    harm = F.col("_s_obs") + (F.lit(m) - F.col("_n_obs")) * F.lit(
        1 << (w + 1)
    ).cast("long")
    return out.select(
        *group_cols,
        harm.alias("harm_num"),
        (F.lit(m) - F.col("_n_obs")).cast("long").alias("n_zero_buckets"),
        F.floor(F.lit(alpha_num) / harm.cast("double")).alias("hll_est"),
    )


# Linear counting kicks in below this multiple of m (HLL fig 3). Shared
# with hyperball's Column-level correction so the crossover can never
# drift between the scalar and distributed formulations.
HLL_SMALL_RANGE_FACTOR = 2.5


def hll_corrected(harm_num: int, n_zero: int, bucket_hex: int = 3,
                  rank_hex: int = 12) -> float:
    """Driver-side small-range correction (LogLog §4 / HLL fig 3):
    linear counting when the raw estimate ≤ HLL_SMALL_RANGE_FACTOR·m
    and zero buckets remain. Python-side on the tiny estimate rows —
    floats never enter the distributed/hashed path."""
    m = 16**bucket_hex
    w = rank_hex * 4
    raw = _alpha(m) * m * m * float(1 << (w + 1)) / harm_num
    if raw <= HLL_SMALL_RANGE_FACTOR * m and n_zero > 0:
        return m * math.log(m / n_zero)
    return raw


def quantile_col_name(p: float) -> str:
    """Output column name disc_quantiles/hdr_quantiles give quantile
    ``p`` (0.95 -> 'p95', 0.5 -> 'p50'). Public so downstream consumers
    (operators.politeness.adaptive_delays) never duplicate the format —
    a silent-naming-drift trap flagged in round-2 review."""
    return f"p{str(p)[2:].ljust(2, '0')}"


def disc_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact discrete quantiles per group: for each p, the smallest
    value whose cumulative count ≥ ceil(p·n) — percentile_disc
    semantics, computed via a histogram so it is deterministic under
    ties and cheap under duplicates.

    Plan: (1) hash-aggregate to a (group, value, cnt) histogram —
    map-side combine collapses duplicate values before any shuffle;
    (2) ONE window pass over the histogram (cumulative count ordered
    by value) — sorts distinct values per group, not rows; (3) a final
    hash aggregate takes min(value | cum ≥ threshold) per p. The p·n
    product is a plain IEEE double of two exact operands, so both
    engines land the same threshold — no percentile-function
    implementation details leak into the result.
    """
    hist = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    wg = Window.partitionBy(*group_cols)
    wcum = wg.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        *group_cols,
        F.col(value_col),
        F.sum("_cnt").over(wcum).alias("_cum"),
        F.sum("_cnt").over(wg).alias("_n"),
    )
    aggs = []
    for p in ps:
        thr = F.ceil(F.lit(p) * F.col("_n"))
        name = quantile_col_name(p)
        aggs.append(
            F.min(F.when(F.col("_cum") >= thr, F.col(value_col))).alias(name)
        )
    return cum.groupBy(*group_cols).agg(F.max("_n").alias("n_rows"), *aggs)


# ------------------------------------------------------- count-min sketch

def cms_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of a key column: ``depth × width`` integer
    counters, row j counting keys at bucket md5(key ∥ '#cms' ∥ j) mod
    width. Answers "roughly how often does key x occur?" in O(depth)
    lookups with one-sided error (never an undercount) from a table of
    at most depth·width rows — the bounded-memory twin of an exact
    groupBy-count whose key cardinality would not fit (per-URL hit
    counts at 10^10-frontier scale). Same determinism contract as the
    md5-HLL above: the hash is engine-portable md5 hex → integer, all
    state is integer, so DuckDB replays the sketch byte-for-byte.

    Scale posture: one explode (×depth) + ONE hash aggregate with
    map-side combine onto at most depth·width cells — the shuffle
    carries cells, not keys. Sketches OR-merge across waves/sources by
    (j, bucket) SUM (cms_merge); hot keys cannot skew the shuffle
    because the cell space is fixed.
    """
    reps = df.select(
        F.col(col).cast("string").alias("_k"),
        (F.coalesce(F.col(weight_col), F.lit(0)) if weight_col else F.lit(1))
        .cast("long")
        .alias("_w"),
    ).select(
        "_k", "_w", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    )
    bucket = _cms_bucket(F.col("_k"), F.col("j"), width)
    return (
        reps.select("j", bucket.alias("bucket"), "_w")
        .groupBy("j", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def _cms_bucket(key: Column, j: Column, width: int) -> Column:
    """Engine-portable CMS hash: first 8 hex chars of md5(key∥'#cms'∥j)
    as an integer, mod width. conv() is the same base-16 parse DuckDB's
    from_hex/hex arithmetic replays."""
    h8 = F.substring(F.md5(F.concat(key, F.lit("#cms"), j.cast("string"))), 1, 8)
    return F.pmod(F.conv(h8, 16, 10).cast("long"), F.lit(width))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union CMS tables built with identical (depth, width): per-cell
    SUM — the sketch of the concatenated inputs, exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for a probe key set: est = min over rows j of
    the counter at that key's bucket — ≥ the true count always, ≈ equal
    unless the key collides with heavy keys in EVERY row. Join shape:
    probes × depth rows against ≤ depth·width cells — AQE broadcasts
    the sketch side; integer-only output."""
    pj = probes.select(F.col(col).cast("string").alias("_k")).select(
        "_k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    )
    keyed = pj.select("_k", "j", _cms_bucket(F.col("_k"), F.col("j"), width).alias("bucket"))
    hit = keyed.join(sketch, ["j", "bucket"], "left").select(
        "_k", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return hit.groupBy("_k").agg(F.min("cnt").alias("est")).select(
        F.col("_k").alias(col), "est"
    )


# -------------------------------------------- HDR-style quantile sketch

def hdr_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sub_bits: int = 3,
) -> DataFrame:
    """Mergeable quantile sketch — the 10^12-row path where exact
    disc_quantiles' distinct-value histogram is itself too wide. Each
    non-negative integer value lands in a log-scaled bucket keyed by
    (bit_length, top 1+sub_bits significant bits): ≤ 64·2^(sub_bits+1)
    buckets TOTAL per group regardless of value cardinality, relative
    bucket width ≤ 2^-sub_bits (HdrHistogram / DDSketch's collapsing
    scheme in exact integer arithmetic). Registers SUM-merge across
    waves/sources like the HLL and CMS sketches.

    Determinism contract: bucket = f(bit pattern) only — no floats, no
    logs — so a SQL replay (bin()/shifts) hash-matches, unlike
    approx_percentile whose KLL/GK state is engine-private.

    Scale posture: ONE hash aggregate with map-side combine onto the
    fixed bucket space; skew-proof for the same reason the CMS is (hot
    values collapse into one cell per task before the shuffle).
    """
    v = F.col(value_col)
    bl = F.length(F.bin(v))
    shift = (F.greatest(F.lit(0), bl - F.lit(1 + sub_bits))).cast("int")
    q = F.expr(
        f"shiftright({value_col}, cast(greatest(0, length(bin({value_col}))"
        f" - {1 + sub_bits}) as int))"
    )
    bucket = ((bl - F.lit(1)).cast("long") * F.lit(1 << (sub_bits + 1)) + q)
    return (
        df.select(*group_cols, bucket.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables built with identical sub_bits: per-bucket
    SUM — exactly the sketch of the concatenated inputs."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gcols = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*gcols).agg(F.sum("cnt").alias("cnt"))


def hdr_estimate(
    registers: DataFrame,
    group_cols: list[str],
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 3,
) -> DataFrame:
    """Per-group quantile estimates from the register table: for each p
    the LOWER BOUND of the bucket holding the p-th value — always
    ≤ the true percentile_disc value, within a 2^-sub_bits relative
    band (asserted in tests). Same cumulative-window walk as
    disc_quantiles but over ≤ 64·2^(sub_bits+1) buckets per group."""
    m = 1 << (sub_bits + 1)
    msb = (F.col("bucket") / F.lit(m)).cast("long")
    q = F.col("bucket") % F.lit(m)
    shift = F.greatest(F.lit(0), msb - F.lit(sub_bits)).cast("int")
    lower = F.expr(
        f"shiftleft(bucket % {m}, cast(greatest(0, bucket div {m}"
        f" - {sub_bits}) as int))"
    )
    wg = Window.partitionBy(*group_cols)
    wcum = wg.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = registers.select(
        *group_cols,
        "bucket",
        lower.alias("_lower"),
        F.sum("cnt").over(wcum).alias("_cum"),
        F.sum("cnt").over(wg).alias("_n"),
    )
    aggs = []
    for p in ps:
        thr = F.ceil(F.lit(p) * F.col("_n"))
        name = quantile_col_name(p)
        aggs.append(
            F.min(F.when(F.col("_cum") >= thr, F.col("_lower"))).alias(name)
        )
    return cum.groupBy(*group_cols).agg(
        F.max("_n").cast("long").alias("n_rows"), *aggs
    )


# ---------------------------------------------------------- skew report

def skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    top_k: int = 5,
) -> DataFrame:
    """Join/aggregation-key skew diagnosis — the question to answer
    BEFORE shuffling 100 TB on a key: how heavy is the heaviest key
    relative to the median? Returns ONE row:

      n_keys, n_rows, max_rows, p50_rows, p99_rows   (exact integers)
      top_keys                                        (the top_k
          heaviest keys as 'key=count' strings, count desc, key asc —
          deterministic ties)

    max/p50/p99 per-key row counts decide between a plain shuffle
    (max ≈ p50), AQE skew-join (max ≫ p99 but few heavy keys), or
    salting (heavy keys dominate); the engine's politeness top-k made
    exactly this call with a two-phase salted window.

    Scale posture: one hash aggregate to the per-key histogram (the
    only pass over the data), then quantiles over the DISTINCT count
    values (disc_quantiles' histogram trick again) and a
    TakeOrderedAndProject for the top keys — nothing after the first
    aggregate touches more than n_keys rows.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_rows"))
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    top = (
        per_key.select(key_str.alias("_k"), "_rows")
        .orderBy(F.col("_rows").desc(), F.col("_k").asc())
        .limit(top_k)
        .select(
            F.concat(F.col("_k"), F.lit("="), F.col("_rows").cast("string"))
            .alias("_entry"),
            "_rows",
            "_k",
        )
    )
    top_agg = top.agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("_rows")).alias("n"),
                                            F.col("_k").alias("k"),
                                            F.col("_entry").alias("e")))
                ),
                lambda s: s["e"],
            ),
            ",",
        ).alias("top_keys")
    )
    # count-of-counts histogram: everything after this touches only the
    # DISTINCT per-key row-count values (tiny), and the whole stats row
    # comes out of ONE aggregate — no single-row joins (which Catalyst
    # constant-folds into the cartesian shapes our own audit forbids)
    hist2 = per_key.groupBy("_rows").agg(F.count(F.lit(1)).alias("_c"))
    wcum = Window.orderBy("_rows").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist2.select(
        "_rows",
        "_c",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wall).alias("_nk"),
    )
    stats = cum.agg(
        F.max("_nk").cast("long").alias("n_keys"),
        F.sum(F.col("_rows") * F.col("_c")).cast("long").alias("n_rows"),
        F.max("_rows").cast("long").alias("max_rows"),
        F.min(
            F.when(F.col("_cum") >= F.ceil(0.5 * F.col("_nk")), F.col("_rows"))
        ).cast("long").alias("p50_rows"),
        F.min(
            F.when(F.col("_cum") >= F.ceil(0.99 * F.col("_nk")), F.col("_rows"))
        ).cast("long").alias("p99_rows"),
    )
    # combine the two single-row frames without a join: union with
    # missing columns null-filled, then first(ignorenulls) per column
    both = stats.unionByName(top_agg, allowMissingColumns=True)
    return both.agg(
        *[
            F.first(c, ignorenulls=True).alias(c)
            for c in ("n_keys", "n_rows", "max_rows", "p50_rows",
                      "p99_rows", "top_keys")
        ]
    )
