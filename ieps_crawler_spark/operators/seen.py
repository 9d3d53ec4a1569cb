"""URL-seen dedup — exact anti-join backstop + sharded Bloom pre-filter
(SURVEY O12; reference semantics: ``UNIQUE(page.url)`` probes in
db/CrawlerDIO.scala:102-134 and enqueue-time dedup in
utils/DuplicateLinks.scala:8-30).

Semantics are ALWAYS exact: the Bloom filter only routes candidates.
A candidate whose shard filter says "definitely not seen" skips the
expensive anti-join probe; "maybe seen" candidates go through the exact
``left_anti`` join. False positives therefore cost a join probe, never a
dropped URL (SURVEY §7 risk note). Overfilling a filter degrades the
false-positive rate (more exact probes), never correctness.

Scale design (10^10 keys at 10 bits/key ≈ 12.5 GB of filter):
- **sharded** by ``xxhash64(canon_url) % n_shards``: blobs live as
  distributed rows, and the probe COGROUPS candidates with blobs on the
  shard key so each task materializes exactly one blob (a broadcast of
  the blob table would ship every shard to every executor and copy the
  blob into every Arrow row).
- **incremental**: filters are fixed-size bitmaps (``n_bits``/``k``
  chosen up front), so wave k's filter = OR(wave k-1 filter,
  build(adds_k)) — O(new keys) per wave instead of rebuilding from the
  full seen set (which would make bloom maintenance quadratic over a
  crawl). ``merge_blooms`` is the OR.
- **JVM-side hashing**: the two Kirsch-Mitzenmacher base hashes are
  ``xxhash64`` columns computed in whole-stage codegen; the pandas side
  only does vectorized index arithmetic — no per-key Python hashing
  anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BLOOM_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("n_shards", IntegerType(), False),
        StructField("n_bits", LongType(), False),
        StructField("n_hashes", IntegerType(), False),
        StructField("bits", BinaryType(), False),
    ]
)

# both base hashes are salted: h1 unsalted would equal the shard hash,
# and with power-of-two shard counts dividing n_bits the j=0 probe index
# of every key in a shard would be confined to 1/n_shards of the bit
# positions — inflating the false-positive rate an order of magnitude
_H1_SALT = "ieps-bloom-h1"
_H2_SALT = "ieps-bloom-h2"


def _with_hashes(df: DataFrame, url_col: str) -> DataFrame:
    """Two independent 64-bit base hashes, JVM-side (xxhash64 codegen)."""
    return df.withColumn(
        "_h1", F.xxhash64(F.lit(_H1_SALT), F.col(url_col))
    ).withColumn("_h2", F.xxhash64(F.lit(_H2_SALT), F.col(url_col)))


def _np_hashes(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    h1 = pdf["_h1"].to_numpy(dtype=np.int64).view(np.uint64)
    # force h2 odd so the double-hash stride never degenerates to 0
    h2 = pdf["_h2"].to_numpy(dtype=np.int64).view(np.uint64) | np.uint64(1)
    return h1, h2


def _k_for(fpp: float) -> int:
    return max(1, min(16, round(-math.log2(fpp))))


def _adaptive_bits(n_keys: int, fpp: float) -> int:
    n_keys = max(n_keys, 16)
    n_bits = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    return ((n_bits + 63) // 64) * 64


def _set_bits(bits: np.ndarray, h1, h2, k: int, n_bits: int) -> None:
    for j in range(k):
        idx = (h1 + np.uint64(j) * h2) % np.uint64(n_bits)
        # bitwise_or.at: unbuffered scatter — plain fancy-index |= keeps
        # only ONE write per duplicate byte index (silent false negatives)
        np.bitwise_or.at(
            bits,
            (idx >> np.uint64(3)).astype(np.int64),
            np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8),
        )


def _test_bits(bits: np.ndarray, h1, h2, k: int, n_bits: int) -> np.ndarray:
    out = np.ones(len(h1), dtype=bool)
    for j in range(k):
        idx = (h1 + np.uint64(j) * h2) % np.uint64(n_bits)
        out &= (bits[idx >> np.uint64(3)] >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
    return out


def build_bloom(
    seen: DataFrame,
    n_shards: int = 8,
    fpp: float = 0.01,
    n_bits: int | None = None,
    url_col: str = "canon_url",
) -> DataFrame:
    """seen(url_col) → one (shard, n_bits, n_hashes, bits) row per
    non-empty shard. Pass a fixed ``n_bits`` to make filters mergeable
    across builds (incremental maintenance); without it each shard sizes
    itself adaptively from its key count (one-shot use)."""
    k = _k_for(fpp)
    sharded = _with_hashes(seen.select(url_col), url_col).select(
        "_h1",
        "_h2",
        F.pmod(F.xxhash64(url_col), F.lit(n_shards)).cast("int").alias("shard"),
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        nb = n_bits if n_bits is not None else _adaptive_bits(len(pdf), fpp)
        bits = np.zeros(nb // 8, dtype=np.uint8)
        if len(pdf):
            h1, h2 = _np_hashes(pdf)
            _set_bits(bits, h1, h2, k, nb)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0]) if len(pdf) else 0],
                "n_shards": [n_shards],
                "n_bits": [nb],
                "n_hashes": [k],
                "bits": [bits.tobytes()],
            }
        )

    return sharded.groupBy("shard").applyInPandas(_build, BLOOM_SCHEMA)


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two sharded filters built with the SAME n_bits/n_hashes.
    Cogrouped per shard: each task ORs at most two blobs."""

    cols = [f.name for f in BLOOM_SCHEMA.fields]

    def _or(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        rows = pd.concat([left, right])
        if len(rows) == 0:
            return rows
        first = rows.iloc[0]
        if len(rows) == 1:
            return rows[cols]
        merged = np.zeros(int(first["n_bits"]) // 8, dtype=np.uint8)
        for _, r in rows.iterrows():
            # a mismatched geometry ORs bitmaps whose probe positions
            # disagree — that is a FALSE NEGATIVE (silent dedup loss),
            # not an fpp degradation, so it must be an error
            if (
                int(r["n_bits"]) != int(first["n_bits"])
                or int(r["n_hashes"]) != int(first["n_hashes"])
                or int(r["n_shards"]) != int(first["n_shards"])
            ):
                raise ValueError(
                    "merge_blooms: mismatched filter geometry "
                    "(n_bits/n_hashes/n_shards must be identical)"
                )
            merged |= np.frombuffer(r["bits"], dtype=np.uint8)
        return pd.DataFrame(
            {
                "shard": [int(first["shard"])],
                "n_shards": [int(first["n_shards"])],
                "n_bits": [int(first["n_bits"])],
                "n_hashes": [int(first["n_hashes"])],
                "bits": [merged.tobytes()],
            }
        )

    return (
        a.groupBy("shard").cogroup(b.groupBy("shard")).applyInPandas(_or, BLOOM_SCHEMA)
    )


def probe_bloom(
    candidates: DataFrame,
    bloom: DataFrame,
    url_col: str = "canon_url",
    n_shards: int | None = None,
) -> DataFrame:
    """Adds boolean ``maybe_seen``: False ⇒ definitely new (skip exact
    probe); True ⇒ must verify via exact anti-join.

    Co-partitioned probe (VERDICT r1 fix): candidates and shard blobs are
    COGROUPED on the shard key, so each task materializes exactly ONE
    blob. A shard group with no blob row (empty shard) is definitely-new
    by construction — which is only sound because ``n_shards`` is read
    from the filter rows themselves, never inferred from the row count
    (build_bloom emits rows only for NON-empty shards, so counting rows
    would mis-shard every candidate whenever any shard came up empty and
    silently re-enqueue seen URLs)."""
    if n_shards is None:
        n_shards = bloom.select("n_shards").first()["n_shards"]
    cand = _with_hashes(candidates, url_col).withColumn(
        "_shard", F.pmod(F.xxhash64(url_col), F.lit(n_shards)).cast("int")
    )
    out_fields = [f for f in candidates.schema.fields] + [
        StructField("maybe_seen", BooleanType())
    ]
    out_schema = StructType(out_fields)
    cand_cols = [f.name for f in candidates.schema.fields]

    def _probe(cands: pd.DataFrame, blobs: pd.DataFrame) -> pd.DataFrame:
        if len(cands) == 0:
            return pd.DataFrame(columns=cand_cols + ["maybe_seen"])
        out = cands[cand_cols].copy()
        if len(blobs) == 0:
            out["maybe_seen"] = False
            return out
        b = blobs.iloc[0]
        bits = np.frombuffer(b["bits"], dtype=np.uint8)
        h1, h2 = _np_hashes(cands)
        out["maybe_seen"] = _test_bits(
            bits, h1, h2, int(b["n_hashes"]), int(b["n_bits"])
        )
        return out

    return (
        cand.groupBy("_shard")
        .cogroup(bloom.groupBy("shard"))
        .applyInPandas(_probe, out_schema)
    )


def dedup_against_seen(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "canon_url",
    bloom: DataFrame | None = None,
    n_shards: int | None = None,
    broadcast_suspects_max: int = 2_000_000,
    seen_rows_hint: int | None = None,
) -> DataFrame:
    """Exact set-minus: candidates whose url is NOT in seen.

    Without a bloom: plain shuffle anti-join — at 10^10-key scale the
    SEEN side of that shuffle is the dominant cost (the whole seen set
    moves every wave).

    With a bloom the semantics stay exact (false positives cost a probe,
    never a dropped URL) and the plan changes shape:
    1. probe routes candidates (one cogroup shuffle of the candidates);
    2. 'definitely new' rows skip verification entirely;
    3. when the suspect set fits a broadcast AND the seen set dwarfs it
       (``seen_rows_hint`` ≥ 20× suspects — the regime where the seen-
       side shuffle is the dominant cost), verification runs as
       seen ⋈ broadcast(suspects) — the seen set STREAMS through a scan
       and never shuffles — followed by a broadcast anti-join of the
       (≤ suspects-sized) hit set. Otherwise the shuffle anti-join is
       cheaper (measured: broadcasting dup-heavy suspect sets against a
       small seen table LOST 35% at bench scale). The suspect count is a
       cheap job on the cached probe output; the crawl driver's per-wave
       clearCache frees the cache."""
    seen_urls = seen.withColumnRenamed("canon_url", url_col).select(url_col)
    if bloom is None:
        return candidates.join(seen_urls, url_col, "left_anti")
    # the routing filter may be either family — Bloom rows carry
    # n_bits/n_hashes, cuckoo rows n_buckets/table (operators.cuckoo);
    # both share the shard-cogrouped probe contract (False ⇒ new)
    if "n_buckets" in bloom.columns:
        from .cuckoo import probe_cuckoo as _probe_filter
    else:
        _probe_filter = probe_bloom
    # lazy localCheckpoint, not cache(): both branches (definitely-new and
    # suspects) consume the probe output, but a cache-manager entry would
    # outlive the call for library users who never run the crawl driver's
    # per-wave clearCache — checkpoint blocks are ContextCleaner-freed
    # when the result is dropped
    flagged = _probe_filter(candidates, bloom, url_col, n_shards=n_shards)
    flagged = flagged.localCheckpoint(eager=False)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    # the suspect count itself costs a (cached-probe) job that serializes
    # the wave pipeline — only pay it once the seen set is big enough
    # that the broadcast plan could possibly win (below ~10M seen keys
    # the shuffle anti-join is always cheap; measured +18% wave time from
    # counting at bench scale for a branch that never fired)
    n_suspects = None
    if seen_rows_hint is not None and seen_rows_hint >= 10_000_000:
        n_suspects = suspects.count()
    if (
        n_suspects is not None
        and n_suspects <= broadcast_suspects_max
        and seen_rows_hint >= 20 * max(n_suspects, 1)
    ):
        hits = seen_urls.join(
            F.broadcast(suspects.select(url_col)), url_col, "inner"
        )
        verified = suspects.join(F.broadcast(hits), url_col, "left_anti")
    else:
        verified = suspects.join(seen_urls, url_col, "left_anti")
    return definitely_new.unionByName(verified)
