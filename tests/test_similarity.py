"""Similarity-search verification (VERDICT r1: lsh_topk/ivf_topk had no
tests and no measured recall — the similarity.py docstring promised a
recall assertion; this file makes it true).

- brute_force_topk vs a pure-numpy exact oracle (independent of Spark).
- lsh_topk / ivf_topk: (a) every returned cosine must equal the exact
  cosine for that (query, candidate) pair — the approximation may only
  lose candidates, never mis-score them; (b) measured recall@10 against
  brute force must clear a floor; (c) multi-probe LSH must dominate
  single-probe recall.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

K = 10


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def exact(emb):
    """query_id -> [(vec_id, cosine)] exact top-K via numpy."""
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1)[:, None]
    out = {}
    for qi in ids[ids % 100 == 0]:
        qv = Mn[np.where(ids == qi)[0][0]]
        cos = Mn @ qv
        order = np.lexsort((ids, -cos))[:K]
        out[int(qi)] = [(int(ids[i]), float(cos[i])) for i in order]
    return out


def _by_query(rows):
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"], r["rank"]))
    for v in got.values():
        v.sort(key=lambda t: t[2])
    return got


def _recall(got, exact):
    vals = []
    for qi, want in exact.items():
        want_ids = {v for v, _ in want}
        got_ids = {v for v, _, _ in got.get(qi, [])}
        vals.append(len(want_ids & got_ids) / K)
    return sum(vals) / len(vals)


def test_brute_force_matches_numpy(emb, queries, exact):
    from ieps_crawler_spark.operators.similarity import brute_force_topk

    got = _by_query(brute_force_topk(emb, queries, k=K).collect())
    assert set(got) == set(exact)
    for qi, want in exact.items():
        assert [v for v, _, _ in got[qi]] == [v for v, _ in want]
        for (gv, gc, _), (_, wc) in zip(got[qi], want):
            assert abs(gc - wc) < 1e-9


def _assert_scores_exact(got, emb_pdf):
    ids = emb_pdf["vec_id"].to_numpy()
    M = np.vstack(emb_pdf["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1)[:, None]
    pos = {int(i): p for p, i in enumerate(ids)}
    for qi, rows in got.items():
        qv = Mn[pos[qi]]
        for v, c, _ in rows:
            assert abs(c - float(Mn[pos[v]] @ qv)) < 1e-6


# Measured recall@10 on the sf0.001 embeddings (500 vecs, 64 dims, 25
# queries, query-directed multiprobe):
#   lsh planes=4 mp=0 0.20 | mp=4 0.47 | mp=8 0.71
#   lsh planes=8 mp=0 0.12 | mp=8 0.21 | mp=16 0.29
#   ivf lists=8 probe=3 0.68 | probe=4 0.77   lists=16 probe=8 0.78
# Single-probe LSH is candidate-starved at 2^planes buckets over a 500-row
# corpus — the floors below assert the measured behavior with margin, and
# the multiprobe/IVF paths carry the real recall story (also in BENCH.md).


def test_lsh_topk_recall_and_scores(emb, queries, exact):
    from ieps_crawler_spark.operators.similarity import lsh_topk

    got = _by_query(lsh_topk(emb, queries, dim=64, k=K, n_planes=8).collect())
    _assert_scores_exact(got, emb.select("vec_id", "embedding").toPandas())
    r = _recall(got, exact)
    assert r >= 0.05, f"single-probe LSH recall collapsed: {r:.3f}"


def test_lsh_multiprobe_improves_recall(emb, queries, exact):
    from ieps_crawler_spark.operators.similarity import lsh_topk

    r1 = _recall(
        _by_query(lsh_topk(emb, queries, dim=64, k=K, n_planes=4).collect()), exact
    )
    r2 = _recall(
        _by_query(
            lsh_topk(emb, queries, dim=64, k=K, n_planes=4, multiprobe=4).collect()
        ),
        exact,
    )
    assert r2 >= r1
    assert r2 >= 0.3, f"multi-probe LSH recall too low: {r2:.3f}"


def test_ivf_topk_recall_and_scores(emb, queries, exact):
    from ieps_crawler_spark.operators.similarity import ivf_topk

    got = _by_query(
        ivf_topk(emb, queries, k=K, n_lists=8, n_probe=4).collect()
    )
    _assert_scores_exact(got, emb.select("vec_id", "embedding").toPandas())
    r = _recall(got, exact)
    assert r >= 0.6, f"IVF recall too low: {r:.3f}"


def test_lsh_jvm_engine_matches_numpy(emb, queries):
    """The catalyst-expression LSH path (oracle twin) and the Arrow/numpy
    path must produce identical buckets and therefore identical top-k."""
    from ieps_crawler_spark.operators.similarity import lsh_topk

    def run(engine):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in lsh_topk(
                emb, queries, dim=64, k=K, n_planes=4, multiprobe=4, engine=engine
            ).collect()
        )

    assert run("jvm") == run("numpy")


def test_ivf_fixed_codebook_recall(emb, queries, exact):
    """Fixed-codebook IVF (the oracle-verified mode) keeps useful recall
    and exact cosine scores."""
    from ieps_crawler_spark.operators.similarity import ivf_topk

    got = _by_query(
        ivf_topk(
            emb, queries, k=K, n_probe=3,
            centroid_ids=[7, 63, 119, 175, 231, 287, 343, 399],
        ).collect()
    )
    _assert_scores_exact(got, emb.select("vec_id", "embedding").toPandas())
    r = _recall(got, exact)
    assert r >= 0.3, f"fixed-codebook IVF recall too low: {r:.3f}"


def _np_kmeans(pdf, n_lists, n_iters, scale=1_000_000):
    """Pure-numpy replay of kmeans_fit: md5-rank init, argmax dot/|c|
    assignment with lowest-j ties, exact fixed-point means."""
    import hashlib

    ids = pdf["vec_id"].to_numpy()
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort([hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids])
    cents = [M[i].copy() for i in order[:n_lists]]
    cj = list(range(n_lists))
    for _ in range(n_iters):
        C = np.vstack(cents)
        score = (M @ C.T) / np.linalg.norm(C, axis=1)[None, :]
        # argmax picks the lowest index on ties, matching (ns, j) min-struct
        assign = np.argmax(score, axis=1)
        new_c, new_j = [], []
        for k in range(len(cents)):
            pts = M[assign == k]
            if len(pts) == 0:
                continue
            # away-from-zero HALF_UP to match Spark F.round and DuckDB
            # round(); np.rint is half-to-even and diverges on exact .5
            # (ADVICE r4 latent-flake finding)
            v = pts * scale
            s = (
                (np.floor(np.abs(v) + 0.5) * np.sign(v))
                .astype(np.int64)
                .sum(axis=0)
            )
            new_c.append((s / float(scale)) / len(pts))
            new_j.append(cj[k])
        cents, cj = new_c, new_j
    return {j: c for j, c in zip(cj, cents)}


def test_kmeans_fit_matches_numpy_replay(spark, emb):
    from ieps_crawler_spark.operators.similarity import kmeans_fit

    pdf = emb.select("vec_id", "embedding").toPandas()
    want = _np_kmeans(pdf, n_lists=8, n_iters=2)
    got = {
        r["j"]: np.array(r["cv"])
        for r in kmeans_fit(emb, n_lists=8, n_iters=2).collect()
    }
    assert set(got) == set(want)
    for j in want:
        assert np.allclose(got[j], want[j], atol=0, rtol=0), f"cluster {j}"


def test_kmeans_fit_partition_independent(emb):
    from ieps_crawler_spark.operators.similarity import kmeans_fit

    a = sorted((r["j"], tuple(r["cv"])) for r in kmeans_fit(emb, 4, 2).collect())
    b = sorted(
        (r["j"], tuple(r["cv"]))
        for r in kmeans_fit(emb.repartition(13), 4, 2).collect()
    )
    assert a == b


def test_kmeans_fit_reduces_quantization_error(emb):
    """Lloyd property: mean distance to assigned centroid after 3
    iterations must not exceed the init assignment's (small tolerance
    for the 1e-6 fixed-point quantization of the M-step)."""
    from ieps_crawler_spark.operators.similarity import (
        assign_to_codebook, kmeans_fit, kmeans_init_ids,
    )

    def mean_cos(cents):
        rows = assign_to_codebook(emb, cents).select("cos_centroid").collect()
        return sum(r[0] for r in rows) / len(rows)

    c0 = kmeans_init_ids(emb, 8)
    c3 = kmeans_fit(emb, 8, 3)
    assert mean_cos(c3) >= mean_cos(c0) - 1e-9


def test_kmeans_codebook_plugs_into_semantic_dedup_and_ivf(emb, queries):
    """The fitted (j, cv) frame is a drop-in codebook for both
    consumers — the completion VERDICT r3 #4 asks for."""
    from ieps_crawler_spark.operators.dedup import semantic_dedup
    from ieps_crawler_spark.operators.similarity import (
        _ivf_with_cents, kmeans_fit,
    )

    cents = kmeans_fit(emb, n_lists=8, n_iters=2)
    sd = semantic_dedup(emb, cents, threshold=0.35)
    n = emb.count()
    assert sd.count() == n
    kept = sd.filter("is_kept").count()
    assert 0 < kept <= n

    from ieps_crawler_spark.operators.similarity import ivf_topk

    topk = ivf_topk(emb, queries, k=K, n_probe=3, centroids=cents)
    got = _by_query(topk.collect())
    assert got and all(len(v) <= K for v in got.values())
    # same codebook through the private path — identical result
    direct = _by_query(_ivf_with_cents(
        emb, queries, cents, k=K, n_probe=3,
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
    ).collect())
    assert got == direct
    with pytest.raises(ValueError, match="not both"):
        ivf_topk(emb, queries, centroid_ids=[1, 2], centroids=cents)
