"""Cuckoo-filter URL-seen pre-filter — the second filter family the
north rule names ("partitioned Bloom/cuckoo URL-seen filter"), same
sharded/cogrouped architecture as operators.seen (one blob per task,
never a broadcast of all shards), with the cuckoo filter's two extras
over a Bloom filter: ~½ the space at equal FP rate for 16-bit
fingerprints, and support for DELETION (drop a URL from the seen set
without rebuilding — a Bloom bitmap cannot unset shared bits).

Semantics contract (same as the Bloom path): candidates flagged
``maybe_seen = False`` are DEFINITELY new — false positives cost an
exact anti-join probe, false negatives are forbidden. Two design points
keep the no-false-negative invariant absolute:

- standard cuckoo inserts FAIL when both candidate buckets are full and
  the bounded eviction walk finds no room; a failed insert would turn
  into a silent false negative on a later probe. Here failed keys land
  in a per-shard exact-fingerprint STASH that probes always consult —
  overfull filters degrade to more exact probes, never to dropped URLs
  (mirrors seen.py's "overfill degrades fpp, never correctness").
- fingerprints are forced nonzero (0 marks an empty slot) and bucket
  pairing uses the Fan et al. (2014) partial-key xor trick
  (i2 = i1 xor H(fp)) over a power-of-two bucket count, so either
  bucket's index is recoverable from the other + the fingerprint —
  which is what makes merge/delete possible without the original keys.

Merge (incremental per-wave maintenance, the analog of seen.merge_blooms)
re-inserts the smaller table's occupied slots into the larger: cost
O(occupied slots of the adds filter) = O(new URLs per wave).

Hashing is JVM-side (xxhash64 whole-stage codegen) like seen.py; the
build is vectorized grouped free-slot placement (_bulk_place — a few
argsorts per batch), with the per-key Python eviction walk ONLY for
keys whose both buckets are already full (rare below ~85% load).

Deletion contract: slots are a MULTISET over distinct keys (exact
duplicate keys are deduped per build on the 64-bit hash pair, but a
colliding distinct key keeps its own slot), so delete(X) can never
erase the only evidence of a different seen URL. Deleting a key that
was never inserted — or inserted by two separate builds then merged,
then deleted twice — falls outside the contract, as in Fan et al.
"""

from __future__ import annotations

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

BUCKET_SLOTS = 4
MAX_KICKS = 500

CUCKOO_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("n_shards", IntegerType(), False),
        StructField("n_buckets", LongType(), False),
        StructField("table", BinaryType(), False),  # uint16[n_buckets*4]
        StructField("stash", BinaryType(), False),  # uint16[] overflow fps
    ]
)

_H1_SALT = "ieps-cuckoo-h1"
_H2_SALT = "ieps-cuckoo-h2"


def _with_hashes(df: DataFrame, url_col: str) -> DataFrame:
    return df.withColumn(
        "_h1", F.xxhash64(F.lit(_H1_SALT), F.col(url_col))
    ).withColumn("_h2", F.xxhash64(F.lit(_H2_SALT), F.col(url_col)))


def _splitmix16(fp: np.ndarray) -> np.ndarray:
    """Mix a 16-bit fingerprint to a bucket offset (uint64)."""
    z = fp.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _fp_and_buckets(pdf: pd.DataFrame, n_buckets: int):
    h1 = pdf["_h1"].to_numpy(dtype=np.int64).view(np.uint64)
    h2 = pdf["_h2"].to_numpy(dtype=np.int64).view(np.uint64)
    fp = (h2 >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    mask = np.uint64(n_buckets - 1)
    b1 = (h1 & mask).astype(np.int64)
    b2 = (b1 ^ (_splitmix16(fp) & mask).astype(np.int64)).astype(np.int64)
    return fp, b1, b2


def _insert_keys(
    table: np.ndarray, stash: list, fp: np.ndarray, b1: np.ndarray, b2: np.ndarray
) -> None:
    """Per-key insert with bounded eviction; overflow → stash. MULTISET
    slots: a duplicate (fingerprint, bucket) pair from a DIFFERENT key
    stores its own copy — the Fan et al. §3.3 precondition that makes
    deletion safe (suppressing the copy would let delete(X) silently
    remove colliding Y's only evidence = a false negative). Exact
    duplicate KEYS are removed before insertion (build dedupes on the
    64-bit hash pair), so each inserted key owns exactly one slot.
    table: uint16[n_buckets, BUCKET_SLOTS]."""
    n_buckets = table.shape[0]
    mask = n_buckets - 1
    rng = np.random.RandomState(0xC0C00)  # deterministic eviction choices
    for f, i1, i2 in zip(fp, b1, b2):
        f = np.uint16(f)
        row = table[i1]
        e = np.where(row == 0)[0]
        if len(e):
            row[e[0]] = f
            continue
        row2 = table[i2]
        e = np.where(row2 == 0)[0]
        if len(e):
            row2[e[0]] = f
            continue
        # eviction walk
        cur_fp, cur_b = f, int(i2)
        placed = False
        for _ in range(MAX_KICKS):
            slot = rng.randint(BUCKET_SLOTS)
            cur_fp, table[cur_b, slot] = table[cur_b, slot], cur_fp
            cur_b = int(
                (cur_b ^ int(_splitmix16(np.array([cur_fp], dtype=np.uint16))[0] & np.uint64(mask)))
            )
            row = table[cur_b]
            e = np.where(row == 0)[0]
            if len(e):
                row[e[0]] = cur_fp
                placed = True
                break
        if not placed:
            stash.append(np.uint16(cur_fp))


def _bulk_place(
    table: np.ndarray, fill: np.ndarray, fp: np.ndarray, b1: np.ndarray, b2: np.ndarray
) -> np.ndarray:
    """Vectorized free-slot placement (no evictions): two passes (home
    bucket, then alt bucket) of grouped rank-assignment against the
    per-bucket fill counts. Returns the index array of keys that found
    no free slot in either bucket (they go through the per-key eviction
    walk). This is the common path — at ≤85% load almost every key
    lands here, so build cost is a handful of argsorts, not a per-key
    Python loop."""
    remaining = np.arange(len(fp))
    for b in (b1, b2):
        if not len(remaining):
            break
        bb = b[remaining]
        order = np.argsort(bb, kind="stable")
        sb = bb[order]
        new_run = np.r_[True, sb[1:] != sb[:-1]]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rank = np.arange(len(sb)) - starts[run_id]
        slot = fill[sb] + rank
        ok = slot < BUCKET_SLOTS
        table[sb[ok], slot[ok]] = fp[remaining[order[ok]]]
        ubuckets = sb[starts]
        run_len = np.diff(np.r_[starts, len(sb)])
        fill[ubuckets] = np.minimum(
            fill[ubuckets] + run_len, BUCKET_SLOTS
        )
        remaining = remaining[order[~ok]]
    return remaining


def build_cuckoo(
    seen: DataFrame,
    n_shards: int = 8,
    n_buckets: int = 1 << 18,
    url_col: str = "canon_url",
) -> DataFrame:
    """seen(url_col) → one (shard, n_buckets, table, stash) row per
    non-empty shard. ``n_buckets`` must be a power of two (partial-key
    xor pairing); capacity ≈ n_buckets * 4 * 0.95. Fixed geometry keeps
    filters mergeable across builds (incremental maintenance)."""
    if n_buckets <= 0 or n_buckets & (n_buckets - 1) != 0:
        # non-power-of-two breaks the xor pairing's involution (probe/
        # merge would mis-pair buckets = silent false negatives)
        raise ValueError("n_buckets must be a power of two")
    sharded = _with_hashes(seen.select(url_col), url_col).select(
        "_h1",
        "_h2",
        F.pmod(F.xxhash64(url_col), F.lit(n_shards)).cast("int").alias("shard"),
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((n_buckets, BUCKET_SLOTS), dtype=np.uint16)
        stash: list = []
        if len(pdf):
            # exact-key dedup on the 64-bit hash pair: each distinct URL
            # owns exactly ONE slot (the delete contract), duplicates in
            # the input cost nothing
            pdf = pdf.drop_duplicates(subset=["_h1", "_h2"])
            fp, b1, b2 = _fp_and_buckets(pdf, n_buckets)
            fill = np.zeros(n_buckets, dtype=np.int64)
            left = _bulk_place(table, fill, fp, b1, b2)
            if len(left):
                _insert_keys(table, stash, fp[left], b1[left], b2[left])
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0]) if len(pdf) else 0],
                "n_shards": [n_shards],
                "n_buckets": [n_buckets],
                "table": [table.tobytes()],
                "stash": [np.array(stash, dtype=np.uint16).tobytes()],
            }
        )

    return sharded.groupBy("shard").applyInPandas(_build, CUCKOO_SCHEMA)


def merge_cuckoos(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold filter ``b`` into ``a`` per shard (same geometry required —
    a geometry mismatch would silently mis-pair buckets = false
    negatives, so it is an error). Occupied slots + stash of the smaller
    side re-insert into the other table: O(occupied(b))."""
    cols = [f.name for f in CUCKOO_SCHEMA.fields]

    def _merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        rows = pd.concat([left, right])
        if len(rows) == 0:
            return rows
        first = rows.iloc[0]
        if len(rows) == 1:
            return rows[cols]
        nb = int(first["n_buckets"])
        for _, r in rows.iterrows():
            if int(r["n_buckets"]) != nb or int(r["n_shards"]) != int(first["n_shards"]):
                raise ValueError("merge_cuckoos: mismatched filter geometry")
        tables = [
            np.frombuffer(r["table"], dtype=np.uint16).reshape(nb, BUCKET_SLOTS).copy()
            for _, r in rows.iterrows()
        ]
        stashes = [
            list(np.frombuffer(r["stash"], dtype=np.uint16)) for _, r in rows.iterrows()
        ]
        # densest table hosts; the other's slots re-insert into it
        host = int(np.argmax([(t != 0).sum() for t in tables]))
        table, stash = tables[host], stashes[host]
        mask = nb - 1
        for j, t in enumerate(tables):
            if j == host:
                continue
            bi, si = np.nonzero(t)
            fps = t[bi, si]
            # an occupied slot's index is one of the pair; xor recovers the
            # partner, and _insert_keys takes (fp, b1, b2) in either order
            alt = bi ^ (_splitmix16(fps) & np.uint64(mask)).astype(np.int64)
            _insert_keys(table, stash, fps, bi, alt)
            # stash entries carry no bucket index → they stay stash
            stash.extend(stashes[j])
        return pd.DataFrame(
            {
                "shard": [int(first["shard"])],
                "n_shards": [int(first["n_shards"])],
                "n_buckets": [nb],
                "table": [table.tobytes()],
                "stash": [np.array(stash, dtype=np.uint16).tobytes()],
            }
        )

    return (
        a.groupBy("shard").cogroup(b.groupBy("shard")).applyInPandas(_merge, CUCKOO_SCHEMA)
    )


def probe_cuckoo(
    candidates: DataFrame,
    cuckoo: DataFrame,
    url_col: str = "canon_url",
    n_shards: int | None = None,
) -> DataFrame:
    """Adds boolean ``maybe_seen`` (False ⇒ definitely new). Cogrouped on
    the shard key — one filter blob per task; vectorized two-bucket +
    stash membership test."""
    if n_shards is None:
        n_shards = cuckoo.select("n_shards").first()["n_shards"]
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
        nb = int(b["n_buckets"])
        table = np.frombuffer(b["table"], dtype=np.uint16).reshape(nb, BUCKET_SLOTS)
        stash = np.frombuffer(b["stash"], dtype=np.uint16)
        fp, b1, b2 = _fp_and_buckets(cands, nb)
        hit = (table[b1] == fp[:, None]).any(axis=1) | (
            table[b2] == fp[:, None]
        ).any(axis=1)
        if len(stash):
            hit |= np.isin(fp, stash)
        out["maybe_seen"] = hit
        return out

    return (
        cand.groupBy("_shard")
        .cogroup(cuckoo.groupBy("shard"))
        .applyInPandas(_probe, out_schema)
    )


def delete_from_cuckoo(
    cuckoo: DataFrame,
    removals: DataFrame,
    url_col: str = "canon_url",
    n_shards: int | None = None,
) -> DataFrame:
    """Remove URLs from the filter (the capability Bloom lacks): clears
    ONE matching fingerprint slot per key. Safe because inserts store
    MULTISET slots (a colliding distinct key keeps its own copy — see
    _insert_keys). Only keys actually inserted may be deleted — deleting
    a never-inserted key can clear another key's colliding fingerprint
    (standard cuckoo-filter contract, Fan et al. §3.3). Stash entries
    matching the fingerprint are dropped likewise. Pass ``n_shards`` to
    skip the scalar-read job over the filter lineage."""
    if n_shards is None:
        n_shards = cuckoo.select("n_shards").first()["n_shards"]
    rem = _with_hashes(removals.select(url_col), url_col).select(
        "_h1",
        "_h2",
        F.pmod(F.xxhash64(url_col), F.lit(n_shards)).cast("int").alias("shard"),
    )
    cols = [f.name for f in CUCKOO_SCHEMA.fields]

    def _delete(blobs: pd.DataFrame, rems: pd.DataFrame) -> pd.DataFrame:
        if len(blobs) == 0:
            return pd.DataFrame(columns=cols)
        b = blobs.iloc[0]
        if len(rems) == 0:
            return blobs[cols]
        nb = int(b["n_buckets"])
        table = np.frombuffer(b["table"], dtype=np.uint16).reshape(nb, BUCKET_SLOTS).copy()
        stash = list(np.frombuffer(b["stash"], dtype=np.uint16))
        fp, b1, b2 = _fp_and_buckets(rems, nb)
        for f, i1, i2 in zip(fp, b1, b2):
            done = False
            for i in (i1, i2):
                s = np.where(table[i] == f)[0]
                if len(s):
                    table[i, s[0]] = 0
                    done = True
                    break
            if not done and np.uint16(f) in stash:
                stash.remove(np.uint16(f))
        return pd.DataFrame(
            {
                "shard": [int(b["shard"])],
                "n_shards": [int(b["n_shards"])],
                "n_buckets": [nb],
                "table": [table.tobytes()],
                "stash": [np.array(stash, dtype=np.uint16).tobytes()],
            }
        )

    return (
        cuckoo.groupBy("shard").cogroup(rem.groupBy("shard")).applyInPandas(_delete, CUCKOO_SCHEMA)
    )
