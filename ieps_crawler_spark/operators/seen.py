"""URL-seen dedup — exact anti-join backstop + sharded Bloom pre-filter
(SURVEY O12; reference semantics: ``UNIQUE(page.url)`` probes in
db/CrawlerDIO.scala:102-134 and enqueue-time dedup in
utils/DuplicateLinks.scala:8-30).

Semantics are ALWAYS exact: the Bloom filter only routes candidates.
A candidate whose shard filter says "definitely not seen" skips the
expensive anti-join probe; "maybe seen" candidates go through the exact
``left_anti`` join. False positives therefore cost a join probe, never a
dropped URL (SURVEY §7 risk note).

Scale math: 10^10 keys at 10 bits/key ≈ 12.5 GB — too big for one
broadcast, hence hash-sharding by ``xxhash64(canon_url) % n_shards``.
Shard blobs are built distributively (applyInPandas per shard group),
persisted as binary rows next to the wave snapshot, and joined to the
co-sharded candidates, so each executor only ever materializes the shard
blobs it probes. In this sandbox shard counts are small; the layout is
what scales.

Pure-numpy double-hash Bloom (k derived from target fpp), no external
libs.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BLOOM_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("n_bits", LongType(), False),
        StructField("n_hashes", IntegerType(), False),
        StructField("bits", BinaryType(), False),
    ]
)


def _hash2(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per value (md5 split — deterministic,
    vectorized enough at batch granularity)."""
    h1 = np.empty(len(values), dtype=np.uint64)
    h2 = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5(v.encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    return h1, h2


def _params(n_keys: int, fpp: float) -> tuple[int, int]:
    n_keys = max(n_keys, 16)
    n_bits = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    n_bits = ((n_bits + 63) // 64) * 64
    k = max(1, int(round(n_bits / n_keys * math.log(2))))
    return n_bits, min(k, 16)


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
    seen: DataFrame, n_shards: int = 8, fpp: float = 0.01, expected_per_shard: int | None = None
) -> DataFrame:
    """seen(canon_url) → (shard, n_bits, n_hashes, bits) one row per shard."""
    sharded = seen.select(
        "canon_url",
        (F.pmod(F.xxhash64("canon_url"), F.lit(n_shards))).cast("int").alias("shard"),
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        n = expected_per_shard or max(len(pdf), 16)
        n_bits, k = _params(n, fpp)
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        if len(pdf):
            h1, h2 = _hash2(pdf["canon_url"])
            _set_bits(bits, h1, h2, k, n_bits)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0]) if len(pdf) else 0],
                "n_bits": [n_bits],
                "n_hashes": [k],
                "bits": [bits.tobytes()],
            }
        )

    return sharded.groupBy("shard").applyInPandas(_build, BLOOM_SCHEMA)


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
    blob — the old broadcast of the whole bloom table shipped every shard
    to every executor (12.5 GB at the module's own 10^10-key math), and
    the subsequent row-wise join would have copied the blob into every
    candidate row of the Arrow batch. A shard group with no blob row
    (bloom built from an empty shard) is definitely-new by construction."""
    if n_shards is None:
        n_shards = bloom.count()  # small table; callers that know pass it
    cand = candidates.withColumn(
        "_shard", F.pmod(F.xxhash64(url_col), F.lit(n_shards)).cast("int")
    )
    out_fields = [f for f in candidates.schema.fields] + [
        StructField("maybe_seen", _bool())
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
        h1, h2 = _hash2(cands[url_col])
        out["maybe_seen"] = _test_bits(
            bits, h1, h2, int(b["n_hashes"]), int(b["n_bits"])
        )
        return out

    return (
        cand.groupBy("_shard")
        .cogroup(bloom.groupBy("shard"))
        .applyInPandas(_probe, out_schema)
    )


def _bool():
    from pyspark.sql.types import BooleanType

    return BooleanType()


def dedup_against_seen(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "canon_url",
    bloom: DataFrame | None = None,
    n_shards: int | None = None,
) -> DataFrame:
    """Exact set-minus: candidates whose url is NOT in seen. With a bloom,
    only 'maybe seen' candidates pay the anti-join shuffle — semantics
    stay exact (false positives cost a probe, never a dropped URL). The
    probe output is cached because both branches (definitely-new and
    suspects) consume it; the crawl driver's per-wave clearCache frees it."""
    if bloom is None:
        return candidates.join(
            seen.withColumnRenamed("canon_url", url_col).select(url_col),
            url_col,
            "left_anti",
        )
    flagged = probe_bloom(candidates, bloom, url_col, n_shards=n_shards)
    flagged.cache()
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified = suspects.join(
        seen.withColumnRenamed("canon_url", url_col).select(url_col),
        url_col,
        "left_anti",
    )
    return definitely_new.unionByName(verified)
