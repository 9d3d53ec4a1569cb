"""Deterministic sampling / dataset-split operators.

A training-data pipeline needs reproducible row selection: the same
document must land in the same split on every run, at every cluster
size, regardless of partitioning — which rules out `df.sample()`
(seeded per-partition RNG: repartitioning changes the sample) and any
`rand()` column. The standard trick is a content-derived hash compared
against a fixed threshold: `md5(key || salt)` is a 128-bit uniform
value, and because both Spark and any ANSI engine render it as the same
32-char lowercase hex string, an equal-length string comparison IS the
numeric comparison — fully engine-portable (the DuckDB oracles replay
it verbatim) and whole-stage-codegen friendly (pure JVM string ops, no
Python, no shuffle, no state).

Scale posture: both operators are stateless narrow maps/filters — they
pushdown-compose with the parquet scan, add zero shuffles, and salting
the key re-draws the assignment without touching the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "split_thresholds_hex",
    "hash_split",
    "deterministic_sample",
    "pack_sequences",
    "mix_weight_parts",
    "mix_sources",
    "group_sample",
]


def split_thresholds_hex(weights: dict[str, float]) -> list[tuple[str, str]]:
    """Cumulative 128-bit thresholds for each split as 32-char lowercase
    hex strings: [(name, upper_bound_hex), ...] in declaration order,
    last bound forced to the max so weights that sum to <1.0 by float
    error still cover every row. Exact integer arithmetic — no float
    comparison happens at assignment time."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    out = []
    acc = 0.0
    names = list(weights)
    for name in names:
        acc += weights[name] / total
        bound = min(int(acc * (1 << 128)), (1 << 128) - 1)
        out.append((name, f"{bound:032x}"))
    # force full coverage for the last split
    out[-1] = (names[-1], "f" * 32)
    return out


def _bucket(key_col: str, salt: str):
    return F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default)
    from the md5 of its key — deterministic, partition-independent,
    disjoint and exhaustive. `salt` re-draws the whole assignment."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bounds = split_thresholds_hex(weights)
    h = _bucket(key_col, salt)
    expr = F.lit(bounds[-1][0])
    for name, bound in reversed(bounds[:-1]):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by key hash: stable under
    repartitioning, re-runs, and engine changes; supersets nest
    (fraction 0.1 ⊂ fraction 0.2 at the same salt), which is exactly
    what ablation ladders want."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction >= 1.0:
        return df
    bound = f"{int(fraction * (1 << 128)):032x}"
    return df.filter(_bucket(key_col, salt) < F.lit(bound))


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    budget: int = 4096,
    shards: int = 64,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences —
    the dataset-assembly step between curation and the data loader.

    Deterministic streaming pack: docs are laid out in id order within
    ``shards`` independent hash shards; a doc starting at cumulative
    offset c lands in sequence floor(c / budget) at offset c % budget
    (docs may straddle a boundary — the loader truncates/continues, the
    standard concat-then-chunk layout). Returns
    (id_col, shard, seq_id, offset).

    Scale posture: each shard packs independently — one shuffle on the
    shard key, a running-sum window per shard, no global sort and no
    single-partition choke; shard count is the parallelism knob and the
    layout is reproducible at any cluster size.
    """
    from pyspark.sql import Window

    out = df.withColumn(
        "_shard", F.pmod(F.col(id_col), F.lit(shards)).cast("int")
    )
    w = (
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.col(tokens_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    # seq_id via integer `div`, not float floor-division: exact for every
    # budget (a non-power-of-two budget with cumulative sums near 2^53
    # could floor-drift under double rounding).
    return out.select(
        id_col, F.col("_shard").alias("shard"), cum_before.alias("_cumb")
    ).select(
        id_col,
        "shard",
        F.expr(f"_cumb div {int(budget)}").alias("seq_id"),
        F.pmod(F.col("_cumb"), F.lit(budget)).alias("offset"),
    )


def mix_weight_parts(weight: float) -> tuple[int, str]:
    """Decompose a mixture weight into (full_epochs, frac_bound_hex):
    floor(w) guaranteed copies plus one extra iff the row's md5 falls
    under the 128-bit threshold encoding the fractional part. The
    threshold is a 32-char lowercase hex literal, so the per-row test is
    the same string comparison `hash_split` uses — engine-portable and
    exact (w=1.0 → bound '000…0', which no md5 is ever below)."""
    if weight < 0:
        raise ValueError("mixture weight must be >= 0")
    base = int(weight)
    frac = weight - base
    return base, f"{int(frac * (1 << 128)):032x}"


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    default_weight: float = 1.0,
    out_col: str = "copy",
) -> DataFrame:
    """Replicate/subsample rows per source to build a training mixture —
    the "source weighting / epoch count" step (Pile- and Llama-style
    data recipes) between curation and sequence packing. Weight 2.5
    means every doc of that source appears twice and a deterministic
    hash-chosen half appear a third time; 0.4 keeps a fixed 40%% once;
    0 drops the source. Output = input columns + ``out_col`` (copy index
    0..n-1, so downstream packing can salt per-epoch).

    Deterministic and partition-independent: the extra-copy choice is
    md5(key || salt || '#mix') against the fractional threshold, never
    an RNG — the same doc gets the same copy count on every run at any
    cluster size, and `salt` re-draws the fractional picks without
    touching the full epochs.

    Scale posture: a narrow map (two literal when-chains over the small
    source vocabulary — no join, no shuffle) followed by
    explode(sequence(0, n-1)); output size is exactly the mixture size.
    Weights live in the plan as literals, so filter/column pushdown to
    the scan is unaffected.
    """
    db, dbound = mix_weight_parts(default_weight)
    base, bound = F.lit(db), F.lit(dbound)
    for s, wgt in weights.items():
        b, bd = mix_weight_parts(wgt)
        base = F.when(F.col(group_col) == s, F.lit(b)).otherwise(base)
        bound = F.when(F.col(group_col) == s, F.lit(bd)).otherwise(bound)
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt + "#mix")))
    n = base + (h < bound).cast("int")
    # sequence(0, -1) would yield [0, -1] (negative inferred step):
    # filter zero-copy rows out BEFORE the explode
    out = df.withColumn("_n_copies", n).filter(F.col("_n_copies") >= 1)
    seq = F.sequence(
        F.lit(0).cast("long"), (F.col("_n_copies") - 1).cast("long")
    )
    return out.select(*df.columns, F.explode(seq).alias(out_col))


def group_sample(
    df: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    k: int = 5,
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-group sample: within each group keep the k
    rows with the smallest md5(key ∥ salt ∥ '#gs') — the "show me 5
    docs per source / per language / per host" eyeball query every
    curation loop runs. Unlike df.sampleBy, the pick is a pure function
    of the key: stable across runs, partitionings, and cluster sizes,
    re-drawable via ``salt``, and the SAME rows appear as the corpus
    grows (a key's hash never changes — new rows only displace old
    picks when they hash lower).

    Scale posture: one host-style windowed top-k per group. Group count
    here is small (sources/langs); for heavy-tailed group keys reuse
    the two-phase salted top-k in operators/politeness.py — same
    contract, provably identical output (tests/test_politeness_salt).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt + "#gs")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
