"""Deduplication operator family for large-scale training-data pipelines.

The reference's dedup is exact (UNIQUE(page.url) + SHA-256 content hash,
crawldb.sql:33,40; CrawlerDIO.scala:73-134). At 100 TB corpus scale a
pipeline additionally needs near-dup detection; this module provides the
standard ladder, all DataFrame-first:

- exact_dedup            — hash-groupBy (JVM sha2/md5, map-side combine)
- mark_content_duplicates— window first-wins (the reference's DUPLICATE
                           marking re-expressed, SURVEY O13)
- minhash_lsh_dedup      — shingle → minhash → band-bucket join (only
                           same-bucket pairs are candidates: the classic
                           LSH trick that replaces the O(n²) self-join
                           with a shuffle on band keys)
- simhash_dedup          — 64-bit simhash + hamming-ball grouping via
                           4-segment pigeonhole blocking
- ngram_jaccard_pairs    — exact Jaccard verification for candidate pairs
- embedding_neardup      — cosine-threshold near-dup over array<float>
- neardup_clusters       — pairs → connected components → one canonical
                           doc per cluster (the dedup endgame: what a
                           training pipeline actually keeps)

Skew/scale notes: shingling+minhash run in one Arrow batch pass (numpy);
band join keys are (band_id, band_hash) — uniformly distributed by
construction, so no salting needed; verification joins only touch
candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content hash: keeper id (min), dup count."""
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def mark_content_duplicates(
    df: DataFrame, hash_col: str = "content_hash", order_col: str = "fetch_order"
) -> DataFrame:
    """First-wins duplicate marking (reference CrawlerDIO.scala:73-86)."""
    w = Window.partitionBy(hash_col).orderBy(order_col)
    return df.withColumn(
        "is_duplicate", F.row_number().over(w) > 1
    )


# ---------------------------------------------------------------- minhash

def _minhash_params(n_perm: int, seed: int = 42):
    """Per-permutation (a, b) for the a*h+b mod 2^64 family: odd `a`
    makes each map a BIJECTION on 64-bit values (a true permutation of
    the hash space), and mod-2^64 arithmetic is free (native uint64
    overflow) where the classic Mersenne-prime modulus cost a 64-bit
    modulo per element — measured as the dominant minhash cost once
    shingling was vectorized."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=n_perm, dtype=np.int64).astype(np.uint64) * 2 + 1
    b = rng.randint(0, 1 << 62, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_POLY_BASE = np.uint64(1099511628211)  # FNV-1a prime as polynomial base
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — restores high/low-bit quality a
    plain polynomial hash lacks (simhash votes use individual bits)."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= _MIX1
    h ^= h >> np.uint64(27)
    h *= _MIX2
    h ^= h >> np.uint64(31)
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit hashes of the k-byte shingles of the normalized
    text (lowercased, whitespace-collapsed), fully vectorized: rolling
    polynomial over the utf-8 bytes (k shifted adds — no per-shingle
    Python loop; the round-1 blake2b-per-shingle version was the
    dominant cost of the whole minhash/simhash pipeline) + splitmix64
    mixing, then np.unique for the set semantics. Texts shorter than k
    hash as one whole-text shingle."""
    if text is None:
        return np.empty(0, dtype=np.uint64)
    t = " ".join(text.lower().split())
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) == 0:
        return _splitmix64(np.zeros(1, dtype=np.uint64))
    keff = min(k, len(b))
    n = len(b) - keff + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for j in range(keff):
            h = h * _POLY_BASE + b[j : j + n]
        return np.unique(_splitmix64(h))


def minhash_udf(n_perm: int = 64, shingle_k: int = 5, seed: int = 42):
    a, b = _minhash_params(n_perm, seed)

    def _mh(texts: pd.Series) -> pd.Series:
        res = []
        with np.errstate(over="ignore"):
            for t in texts:
                h = _shingle_hashes(t, shingle_k)
                if len(h) == 0:
                    res.append([0] * n_perm)
                    continue
                # (a*h + b) mod 2^64, min per permutation — one outer op
                vals = a[:, None] * h[None, :] + b[:, None]
                res.append(vals.min(axis=1).view(np.int64).tolist())
        return pd.Series(res)

    return pandas_udf(_mh, ArrayType(LongType()))


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Returns candidate near-dup pairs (id_a < id_b) with estimated
    Jaccard ≥ threshold. rows = band-bucket join candidates verified by
    minhash agreement fraction."""
    rows_per_band = n_perm // bands
    mh = df.select(
        F.col(id_col).alias("id"), minhash_udf(n_perm, shingle_k)(text_col).alias("sig")
    )
    mh.cache()
    # band key = hash of the band's signature slice
    banded = mh.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice("sig", i * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    est = (
        F.expr(
            "aggregate(zip_with(l.sig, r.sig, (x, y) -> IF(x = y, 1D, 0D)), 0D, (acc, v) -> acc + v)"
        )
        / F.lit(float(n_perm))
    )
    # estimate filter INSIDE the join output, BEFORE the pair-dedup
    # shuffle: sub-threshold candidates die in the join task instead of
    # shuffling (the estimate is a cheap JVM zip_with; the dropDuplicates
    # shuffle is the expensive part)
    cand = left.join(
        right,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        est.alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= threshold)
    return cand.dropDuplicates(["id_a", "id_b"])


# ---------------------------------------------------------------- simhash


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sim): 64-bit simhash over the DISTINCT lowercased whitespace
    tokens of ``text_col`` (token-feature simhash à la Manku et al.,
    WWW'07 — the reference itself has no near-dup stage, see module
    docstring). Token hash = first 16 hex chars of md5 interpreted as an
    unsigned 64-bit integer; simhash bit b is set iff the +1/-1 votes of
    bit b across token hashes sum positive.

    Entirely JVM-side (split/md5/conv/shift + one hash aggregate with 64
    partial sums — whole-stage codegen, map-side combine), so the result
    is integer-deterministic and the DuckDB oracle in __spark_entry__
    recomputes it exactly. Docs with no tokens (empty text) drop out.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    hhex = F.md5("tok")
    t = toks.select(
        "id",
        F.conv(F.substring(hhex, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(hhex, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    votes = [
        F.sum(
            F.shiftrightunsigned(F.col("hi" if b >= 32 else "lo"), b % 32)
            .bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"v{b}")
        for b in range(64)
    ]
    v = t.groupBy("id").agg(*votes)
    # bit 63 contributes Long.MIN_VALUE (two's complement) so the packed
    # value stays a plain signed 64-bit long
    sim = None
    for b in range(64):
        term = F.when(
            F.col(f"v{b}") > 0, F.lit((1 << b) if b < 63 else -(1 << 63))
        ).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return v.select("id", sim.alias("sim"))


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Pigeonhole
    blocking: split 64 bits into 4 segments — any pair within hamming 3
    agrees exactly on ≥1 segment, so candidates = same-segment-value
    join (no O(n²)). Blocking is EXACT for max_hamming ≤ 3 (recall 1.0
    by the pigeonhole principle), which is what lets the DuckDB all-pairs
    oracle verify this query end-to-end."""
    sh = simhash64(df, text_col, id_col)
    seg = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg"),
                        F.shiftrightunsigned("sim", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("s"),
    ).select("id", "sim", "s.seg", "s.val")
    l, r = seg.alias("l"), seg.alias("r")
    # hamming test INSIDE the join predicate: far pairs die in the join
    # task, so only near pairs (plus their ≤4-segment multiplicity) reach
    # the dropDuplicates shuffle — on a low-entropy corpus the candidate
    # set can be 10×+ the near set, and shuffling it would dominate
    cand = l.join(
        r,
        (F.col("l.seg") == F.col("r.seg"))
        & (F.col("l.val") == F.col("r.val"))
        & (F.col("l.id") < F.col("r.id"))
        & (
            F.bit_count(F.col("l.sim").bitwiseXOR(F.col("r.sim")))
            <= max_hamming
        ),
    ).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        F.bit_count(F.col("l.sim").bitwiseXOR(F.col("r.sim"))).alias("hamming"),
    )
    return cand.dropDuplicates(["id_a", "id_b"])


# ----------------------------------------------------------- ngram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given candidate (id_a, id_b) pairs —
    the verification stage after LSH candidate generation."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("words"),
    )
    # n-grams via slice over the word array (JVM-side)
    grams = grams.withColumn(
        "grams",
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, greatest(size(words) - {n - 1}, 1)), "
                f"i -> array_join(slice(words, i, {n}), ' '))"
            )
        ),
    ).select("id", "grams")
    a = grams.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "grams_a")
    b = grams.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "grams_b")
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("double")
    union = F.size(F.array_union("grams_a", "grams_b")).cast("double")
    return joined.select(
        "id_a",
        "id_b",
        (inter / F.when(union > 0, union)).alias("jaccard"),
    )


# -------------------------------------------------------- embedding cosine


def _pair_schema(emb: DataFrame, id_col: str) -> str:
    idt = emb.schema[id_col].dataType.simpleString()
    return f"id_a {idt}, id_b {idt}, cosine double"


def embedding_neardup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_size: int = 16384,
    broadcast_rows: int = 65536,
) -> DataFrame:
    """Cosine-threshold near-dup pairs (id_a < id_b), exact, as a blocked
    matrix product — NO driver-side collect of the corpus:

    - corpus > ``broadcast_rows``: **block-grid path.** Rows hash into
      ``ceil(n / block_size)`` blocks; each block is packed ONCE into a
      single (ids, L2-normalized float64 matrix) row via applyInPandas;
      the (i ≤ j) block-pair grid is built by equi-joining the tiny block
      list, and each grid task multiplies exactly two packed blocks with
      one numpy matmul. Peak memory per task = 2 blocks + one
      block_size² score tile; shuffle volume = n_blocks × corpus (the
      inherent all-pairs cost, spread across the cluster instead of the
      driver). shuffle_hash hints keep the planner from broadcasting the
      packed blocks (row-count stats lie about their byte size).
    - corpus ≤ ``broadcast_rows``: **broadcast fast path.** The right
      side is collected driver-side and broadcast; each Arrow batch of
      the left side computes `A_batch @ B.T` (a theta-join with
      interpreted array aggregates measured ~50x slower).

    For sub-all-pairs cost route candidates through LSH/IVF first
    (operators/similarity.py); the per-block kernel is identical.
    Output id columns inherit the input id column's type."""
    import numpy as np

    out_schema = _pair_schema(emb, id_col)
    n = emb.count()
    if n <= broadcast_rows:
        return _neardup_broadcast(emb, id_col, vec_col, threshold, out_schema)

    import pickle

    n_blocks = (n + block_size - 1) // block_size
    blocked = emb.select(
        F.pmod(F.xxhash64(id_col), F.lit(n_blocks)).cast("int").alias("block"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
        Mn = M / np.linalg.norm(M, axis=1)[:, None]
        return pd.DataFrame(
            {
                "block": [int(pdf["block"].iloc[0])],
                "ids": [pickle.dumps(pdf["id"].to_numpy())],
                "mat": [Mn.tobytes()],
                "dim": [Mn.shape[1]],
            }
        )

    packed = blocked.groupBy("block").applyInPandas(
        _pack, "block int, ids binary, mat binary, dim int"
    )
    # pack ONCE: the grid consumes packed twice (both join sides), and a
    # lazy plan would re-shuffle + re-pack the whole corpus per consumer;
    # eager localCheckpoint materializes the blobs a single time
    packed = packed.localCheckpoint(eager=True)
    # block ids are 0..n_blocks-1 by construction — build the (i <= j)
    # grid from a range (empty blocks drop in the inner joins below)
    blocks = emb.sparkSession.range(n_blocks).select(F.col("id").cast("int"))
    grid = (
        blocks.select(F.col("id").alias("ba"))
        .join(blocks.select(F.col("id").alias("bb")), F.col("ba") <= F.col("bb"))
    )
    paired = (
        grid.join(
            packed.hint("shuffle_hash").select(
                F.col("block").alias("ba"),
                F.col("ids").alias("ids_a"),
                F.col("mat").alias("mat_a"),
                F.col("dim").alias("dim"),
            ),
            "ba",
        )
        .join(
            packed.hint("shuffle_hash").select(
                F.col("block").alias("bb"),
                F.col("ids").alias("ids_b"),
                F.col("mat").alias("mat_b"),
            ),
            "bb",
        )
        # one grid cell per task: the matmul dominates, so spread cells
        .repartition(int(n_blocks * (n_blocks + 1) // 2), "ba", "bb")
    )

    def _cells(it):
        for pdf in it:
            for r in pdf.itertuples(index=False):
                dim = int(r.dim)
                ida = pickle.loads(r.ids_a)
                idb = pickle.loads(r.ids_b)
                A = np.frombuffer(r.mat_a, dtype=np.float64).reshape(-1, dim)
                B = np.frombuffer(r.mat_b, dtype=np.float64).reshape(-1, dim)
                S = A @ B.T
                ii, jj = np.where(S >= threshold)
                if not len(ii):
                    continue
                xa, xb = ida[ii], idb[jj]
                # orient each hit as (min, max) — block ids are hash-
                # assigned, so row-id order is independent of (ba, bb)
                # orientation; drop self-pairs
                keep = xa != xb
                lo = np.minimum(xa[keep], xb[keep])
                hi = np.maximum(xa[keep], xb[keep])
                yield pd.DataFrame(
                    {"id_a": lo, "id_b": hi, "cosine": S[ii[keep], jj[keep]]}
                )

    cells = paired.mapInPandas(_cells, out_schema)
    # off-diagonal cells can emit the same oriented pair only once (each
    # unordered row pair lives in exactly one unordered block pair), but
    # diagonal cells emit (a,b) from both triangle halves — dropDuplicates
    # on the pair key restores set semantics
    return cells.dropDuplicates(["id_a", "id_b"])


def _neardup_broadcast(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float, out_schema: str
) -> DataFrame:
    import numpy as np

    pdf = emb.select(id_col, vec_col).toPandas()
    ids_all = pdf[id_col].to_numpy()
    M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1)[:, None]
    bc = emb.sparkSession.sparkContext.broadcast((ids_all, Mn))

    def gen(it):
        ids_b, B = bc.value
        for p in it:
            if not len(p):
                continue
            A = np.vstack(p[vec_col].to_numpy()).astype(np.float64)
            An = A / np.linalg.norm(A, axis=1)[:, None]
            S = An @ B.T
            ida = p[id_col].to_numpy()
            ii, jj = np.where((S >= threshold) & (ids_b[None, :] > ida[:, None]))
            yield pd.DataFrame(
                {"id_a": ida[ii], "id_b": ids_b[jj], "cosine": S[ii, jj]}
            )

    return emb.select(id_col, vec_col).mapInPandas(gen, out_schema)


# ------------------------------------------------- cluster + canonical pick


def neardup_clusters(
    entities: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    prefer_col: str | None = None,
    max_iterations: int = 40,
) -> DataFrame:
    """Collapse near-dup pairs into clusters and pick one canonical row
    per cluster — the step after pair generation that a training-data
    pipeline actually runs (keep one representative, drop the rest).

    `pairs` is any (id_a, id_b) near-dup pair frame (minhash/simhash/
    ngram/embedding family above). Clusters are connected components of
    the pair graph (transitive closure: A~B, B~C ⇒ one cluster), labeled
    by the minimum reachable id; entities in no pair are singleton
    clusters of themselves. Canonical = max `prefer_col` (ties → min id)
    when given, else min id.

    Returns (id_col, cluster_id, is_canonical) with one row per entity.

    Scale posture: components run via graph.connected_components
    (pointer-jumped min-label propagation, one shuffle + one scalar
    observation per round); canonical selection is a groupBy aggregate
    (map-side partial min of a (neg-prefer, id) struct), NOT a window —
    a giant dup cluster (the common web case: boilerplate pages) would
    make a window sort one hot partition, while the struct-min combines
    locally before the shuffle.
    """
    from .graph import connected_components

    comp = connected_components(
        pairs.select("id_a", "id_b"), "id_a", "id_b", max_iterations
    )
    cols = [F.col(id_col)] + ([F.col(prefer_col)] if prefer_col else [])
    base = entities.select(*cols)
    labeled = base.join(comp, base[id_col] == comp["node_id"], "left").select(
        base[id_col],
        F.coalesce(comp["component"], base[id_col]).alias("cluster_id"),
        *([base[prefer_col]] if prefer_col else []),
    )
    if prefer_col:
        pick = F.min(
            F.struct(
                (-F.col(prefer_col)).alias("_np"), F.col(id_col).alias("_i")
            )
        )["_i"]
    else:
        pick = F.min(id_col)
    canon = labeled.groupBy("cluster_id").agg(pick.alias("_canon"))
    return labeled.join(canon, "cluster_id").select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("_canon")).alias("is_canonical"),
    )


def semantic_dedup(
    emb: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_iterations: int = 40,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster embeddings with a coarse
    codebook, find near-dup pairs ONLY within each cluster, and keep
    one representative per near-dup group — the paper's keep rule:
    the member with the LOWEST cosine to its cluster centroid (drop the
    prototypical copies, keep the outlier), ties → min id.

    ``centroids``: a small (j int, cv array<double>) codebook DataFrame,
    or a list of ``emb`` ids to use as a fixed codebook
    (similarity.codebook_from_ids — deterministic and SQL-expressible,
    how the DuckDB oracle replays this). A k-means fit can be plugged in
    as the codebook frame without touching this function.

    Returns (vec_id, list_id, group_id, cos_centroid, is_kept), one row
    per input vector: the cluster (codebook list), the near-dup group
    (connected component of the within-cluster ≥ threshold pair graph;
    singletons group with themselves), the cosine to the assigned
    centroid, and the keep/drop decision.

    Scale posture — the SemDeDup tractability argument, unchanged:
    assignment is one broadcast-codebook join folded by a map-side
    min-struct aggregate (similarity.assign_to_codebook); the quadratic
    pair cost is confined within clusters (Σ|c|² ≪ n² — the codebook
    size is the dial, the paper runs k = 50k on LAION), via ONE
    self-join on list_id; groups come from the pointer-jumped
    connected-components operator, and the canonical pick is a
    struct-min groupBy aggregate — no window over members, hub-safe for
    the giant boilerplate cluster case. Pairs never cross clusters by
    construction, so components stay cluster-local with no extra key.
    """
    from .similarity import _cosine, assign_to_codebook, codebook_from_ids

    if isinstance(centroids, (list, tuple)):
        centroids = codebook_from_ids(emb, list(centroids), id_col, vec_col)
    assigned = assign_to_codebook(emb, centroids, id_col, vec_col)
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("list_id"),
        F.col("cvec").alias("va"),
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("list_id"),
        F.col("cvec").alias("vb"),
    )
    pairs = (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_cosine("va", "vb") >= threshold)
        .select("id_a", "id_b")
    )
    entities = assigned.select(
        "vec_id", "list_id", "cos_centroid",
        (-F.col("cos_centroid")).alias("_neg_cos"),
    )
    groups = neardup_clusters(
        entities, pairs, "vec_id", prefer_col="_neg_cos",
        max_iterations=max_iterations,
    )
    return (
        entities.join(groups, "vec_id")
        .select(
            "vec_id",
            "list_id",
            F.col("cluster_id").alias("group_id"),
            "cos_centroid",
            F.col("is_canonical").alias("is_kept"),
        )
    )


# ------------------------------------------------------- decontamination


def ngram_contamination(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination signal (the GPT-3-style n-gram
    collision check, n configurable): flag every training doc sharing
    at least one distinct word n-gram with the eval set. Returns
    (id_col, n_eval_hits, contaminated) for every train row.

    Scale posture: eval grams are broadcast (eval sets are
    benchmark-sized by construction — if yours is not, swap the
    broadcast for a shuffle join on the gram key); the train side is
    one scan + one map-side-combining aggregate, never a self-join."""

    def grams(df: DataFrame) -> DataFrame:
        g = df.select(
            F.col(id_col).alias("id"),
            F.split(F.lower(F.col(text_col)), r"\s+").alias("words"),
        )
        return g.select(
            "id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, greatest(size(words) - {n - 1}, 1)), "
                        f"i -> array_join(slice(words, i, {n}), ' '))"
                    )
                )
            ).alias("gram"),
        )

    ev = grams(evalset).select("gram").distinct()
    hits = (
        grams(train)
        .join(F.broadcast(ev), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_eval_hits"))
        .withColumnRenamed("id", id_col)
    )
    return (
        train.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_eval_hits", F.lit(0).cast("long")).alias("n_eval_hits"),
            (F.coalesce("n_eval_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ------------------------------------------------------- line-level dedup

def remove_duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document line-level dedup (the CCNet/RefinedWeb boilerplate
    pass): drop every occurrence of a line that appears in >= min_docs
    DISTINCT documents, rebuild each document from its surviving lines
    in original order. The reference dedups whole pages only
    (CrawlerDIO.scala:73-86); at corpus scale the dominant duplication
    is repeated nav/footer/cookie-banner lines *inside* otherwise-unique
    pages, which only a line-granular pass removes.

    Returns (id_col, text_col, n_lines, n_removed) — one row per input
    row, text_col rebuilt with ``delim`` between kept lines ('' when
    every line was removed).

    Semantics (deterministic, order-free):
      - a "line" is a delim-separated segment; matching is on the
        normalized form trim(lower(line));
      - blank/whitespace-only lines are never counted and never removed
        (they carry layout, not content — and counting them would make
        every doc pair "share" a line);
      - ALL occurrences of an over-threshold line are dropped (no
        first-wins: keeping one arbitrary occurrence would make output
        depend on scan order, which varies across cluster sizes).

    Scale posture: two shuffles + one join, no self-join —
      1. explode lines, hash-count DISTINCT docs per normalized line
         (map-side partial agg on md5 keys: uniformly distributed, no
         skew salting needed);
      2. left_anti join lines against the over-threshold hash set (AQE
         broadcasts it when small — boilerplate sets are tiny relative
         to the corpus — else shuffled hash join on uniform keys);
      3. groupBy doc to reassemble (collect_list bounded by document
         size, the same bound any per-doc op already has).
    The rebuild join back to the input preserves rows whose lines all
    died; only (id, pos, line) triples ever shuffle, never full docs.
    """
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    )
    lines = base.select(
        "_id",
        F.posexplode(F.split(F.col("_text"), F.lit(delim), -1)).alias(
            "_pos", "_line"
        ),
    ).withColumn("_norm", F.trim(F.lower(F.col("_line"))))
    content = lines.filter(F.length("_norm") > 0).withColumn(
        "_lh", F.md5(F.col("_norm"))
    )
    over = (
        content.groupBy("_lh")
        .agg(F.count_distinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_lh")
    )
    kept = (
        lines.withColumn("_lh", F.md5(F.col("_norm")))
        .filter(F.length("_norm") > 0)
        .join(over, "_lh", "left_anti")
        .unionByName(lines.filter(F.length("_norm") == 0).withColumn("_lh", F.lit(None)))
    )
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            delim,
        ).alias("_kept_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_lines = F.size(F.split(F.col("_text"), F.lit(delim), -1))
    return (
        base.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_kept_text", F.lit("")).alias(text_col),
            n_lines.alias("n_lines"),
            (n_lines - F.coalesce("_n_kept", F.lit(0))).cast("int").alias("n_removed"),
        )
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-substring statistics — the exact-
    substring member of the dedup ladder (the pass Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better" runs
    with a suffix array on one machine, re-expressed as a distributed
    word-n-gram join; the reference dedups whole pages only,
    CrawlerDIO.scala:73-86).

    A word position is "duplicated" when the n-gram starting there
    also appears in >= min_docs - 1 OTHER documents. Because every word
    offset gets a gram (stride 1 in words), any cross-doc repeated run
    of >= n words is detected regardless of alignment — no suffix
    structure needed. Per document this returns:

      n_grams            total gram positions (0 for docs under n words)
      shared_grams       positions whose gram is cross-doc duplicated
      longest_span_words longest run of consecutive duplicated
                         positions + n - 1 (= the longest exactly-
                         repeated word span; 0 when none)

    A curation pipeline cuts on shared_grams / n_grams (dup ratio) or
    clips docs whose longest_span_words exceeds the Lee-et-al 50-token
    threshold. All-integer output: hash-stable across engines.

    Scale posture: explode word n-grams (one row per word, O(total
    tokens)) -> hash md5(gram) so only 32-byte keys shuffle, never the
    gram text; ONE hash aggregate for distinct-doc counts (map-side
    combine collapses boilerplate grams per task before the shuffle);
    the over-threshold gram set is small relative to the corpus, so
    the flag join is AQE-broadcastable (else a shuffled join on
    uniformly-distributed hash keys — no salting needed); the run
    detection is one window per doc over that doc's SHARED positions
    only (gaps-and-islands: pos - row_number), so the window shuffle
    carries duplicated positions, not the whole corpus.
    """
    from .text import word_ngrams

    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    grams = base.select(
        "_id", F.posexplode(word_ngrams("_t", n)).alias("_pos", "_g")
    ).select("_id", "_pos", F.md5("_g").alias("_gh"))
    over = (
        grams.groupBy("_gh")
        .agg(F.count_distinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_gh")
    )
    flagged = grams.join(over.withColumn("_shared", F.lit(True)), "_gh", "left")
    totals = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("_shared"), F.lit(False)).cast("int")).alias(
            "shared_grams"
        ),
    )
    isl = (
        flagged.filter(F.col("_shared"))
        .withColumn(
            "_grp",
            F.col("_pos")
            - F.row_number().over(Window.partitionBy("_id").orderBy("_pos")),
        )
        .groupBy("_id", "_grp")
        .agg(F.count(F.lit(1)).alias("_run"))
        .groupBy("_id")
        .agg(F.max("_run").alias("_longest"))
    )
    return (
        base.select("_id")
        .join(totals, "_id", "left")
        .join(isl, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("shared_grams", F.lit(0))
            .cast("long")
            .alias("shared_grams"),
            F.when(F.col("_longest").isNull(), F.lit(0))
            .otherwise(F.col("_longest") + F.lit(n - 1))
            .cast("long")
            .alias("longest_span_words"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The removal half of the Lee-et-al exact-substring pass (stats
    half: duplicate_span_stats): rewrite each document with every word
    that participates in a cross-document duplicated word-n-gram cut
    out, preserving the order of the surviving words. Docs shorter than
    n words (no grams) pass through untouched. Returns
    (id, clean_text, n_words, n_removed).

    Scale posture: the shared-gram detection is duplicate_span_stats'
    plan (md5-key aggregate + flag join); the removal adds one
    explode(sequence) over SHARED starts only (covered word positions —
    O(duplicated text), not O(corpus)), a left-anti join on (doc, pos),
    and one per-doc rebuild aggregate. The rebuild sorts each doc's
    surviving words inside an array aggregate (array_sort on (pos,
    word) structs — per-doc memory = that doc's words, the same bound
    any text rewrite has), so no window over the token stream and no
    skew beyond document length itself.
    """
    from .text import word_ngrams

    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    grams = base.select(
        "_id", F.posexplode(word_ngrams("_t", n)).alias("_pos", "_g")
    ).select("_id", "_pos", F.md5("_g").alias("_gh"))
    over = (
        grams.groupBy("_gh")
        .agg(F.count_distinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_gh")
    )
    covered = (
        grams.join(over, "_gh")
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + F.lit(n - 1))
            ).alias("_pos"),
        )
        .distinct()
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col("_t"))), r"\s+", " ")
    words = base.select(
        "_id", F.posexplode(F.split(norm, " ")).alias("_pos", "_w")
    ).filter(F.length("_w") > 0)
    kept = words.join(covered, ["_id", "_pos"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_w"))),
                lambda s: s["_w"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = words.groupBy("_id").agg(F.count(F.lit(1)).alias("n_words"))
    return (
        base.select("_id")
        .join(totals, "_id", "left")
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            (
                F.coalesce("n_words", F.lit(0))
                - F.coalesce("_n_kept", F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Asymmetric Broder containment for candidate pairs:
    C(a,b) = |grams(a) ∩ grams(b)| / |grams(a)| — the quote/subset
    detector Jaccard misses (a short doc fully copied into a long one
    has LOW Jaccard but containment 1.0; the curation call is "drop the
    contained doc", not "near-dup pair"). Returns both directions in
    exact permille plus the raw sizes, all integers: hash-stable.

    Docs shorter than ``n`` words have NO n-grams (the word_ngrams
    empty-array contract): their gram set is empty and their
    containment direction is null — 'no signal', distinguishable from
    a measured 0 ('not contained'). The earlier form fabricated one
    shorter-than-n pseudo-gram, which silently reported a 1-2 word doc
    quoted inside a longer one as containment 0.

    Scale posture: identical to ngram_jaccard_pairs — gram sets are
    built once per doc (JVM transform/slice, distinct'ed) and joined to
    the PAIRS list only; cost is O(candidate pairs), never all-pairs.
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("words"),
    )
    grams = grams.withColumn(
        "grams",
        F.when(
            F.size("words") >= n,
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(words) - {n - 1}), "
                    f"i -> array_join(slice(words, i, {n}), ' '))"
                )
            ),
        ).otherwise(F.expr("cast(array() as array<string>)")),
    ).select("id", "grams")
    a = grams.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "grams_a")
    b = grams.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "grams_b")
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("long")
    na = F.size("grams_a").cast("long")
    nb = F.size("grams_b").cast("long")
    return joined.select(
        "id_a",
        "id_b",
        na.alias("n_grams_a"),
        nb.alias("n_grams_b"),
        inter.alias("n_common"),
        # div-by-zero yields null = 'no signal' for gram-less short docs
        F.expr(
            f"(cast(size(array_intersect(grams_a, grams_b)) as bigint)"
            f" * 1000) div nullif(size(grams_a), 0)"
        ).alias("contain_a_pm"),
        F.expr(
            f"(cast(size(array_intersect(grams_a, grams_b)) as bigint)"
            f" * 1000) div nullif(size(grams_b), 0)"
        ).alias("contain_b_pm"),
    )
