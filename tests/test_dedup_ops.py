"""Unit tests for the near-dup operator family (VERDICT r1 gap: the LSH
family returned rows nothing ever checked). Each operator is asserted
against a slow pure-Python/numpy oracle computed with the same seeds."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _numpy_neardup_pairs(pdf, threshold):
    ids = pdf["vec_id"].to_numpy()
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1)[:, None]
    S = Mn @ Mn.T
    ii, jj = np.where(S >= threshold)
    return {
        (int(ids[i]), int(ids[j])): S[i, j]
        for i, j in zip(ii, jj)
        if ids[i] < ids[j]
    }


def test_embedding_neardup_grid_matches_numpy(spark, emb):
    """Block-grid path (forced: broadcast_rows=0) == exact numpy all-pairs."""
    from ieps_crawler_spark.operators.dedup import embedding_neardup

    got = embedding_neardup(
        emb, "vec_id", "embedding", threshold=0.35, block_size=64, broadcast_rows=0
    ).collect()
    want = _numpy_neardup_pairs(emb.select("vec_id", "embedding").toPandas(), 0.35)
    got_pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in got}
    assert set(got_pairs) == set(want)
    for k, v in got_pairs.items():
        assert abs(v - want[k]) < 1e-9
    # no duplicate pairs from diagonal cells
    assert len(got) == len(got_pairs)


def test_embedding_neardup_grid_equals_broadcast(spark, emb):
    from ieps_crawler_spark.operators.dedup import embedding_neardup

    grid = embedding_neardup(
        emb, "vec_id", "embedding", 0.35, block_size=100, broadcast_rows=0
    )
    bcast = embedding_neardup(
        emb, "vec_id", "embedding", 0.35, broadcast_rows=10**9
    )
    g = {(r["id_a"], r["id_b"]): round(r["cosine"], 9) for r in grid.collect()}
    b = {(r["id_a"], r["id_b"]): round(r["cosine"], 9) for r in bcast.collect()}
    assert g == b


def test_embedding_neardup_nonlong_ids(spark, emb):
    """Output id columns derive from the input id type (ADVICE r1: the
    old schema hardcoded long)."""
    from ieps_crawler_spark.operators.dedup import embedding_neardup

    sid = emb.select(
        F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    out = embedding_neardup(sid, "vec_id", "embedding", 0.5, block_size=64,
                            broadcast_rows=0)
    assert dict(out.dtypes)["id_a"] == "string"
    rows = out.limit(5).collect()
    for r in rows:
        assert r["id_a"].startswith("v") and r["id_a"] < r["id_b"]


def test_embedding_neardup_no_driver_collect_in_grid_path(spark, emb, monkeypatch):
    """The grid path must never call toPandas (driver collect) — poison
    it and run the full pipeline."""
    from pyspark.sql import DataFrame

    from ieps_crawler_spark.operators.dedup import embedding_neardup

    def _poisoned(self, *a, **k):
        raise AssertionError("driver-side toPandas in the grid path")

    monkeypatch.setattr(DataFrame, "toPandas", _poisoned)
    out = embedding_neardup(
        emb, "vec_id", "embedding", 0.9, block_size=64, broadcast_rows=0
    )
    assert out.count() >= 0


# ------------------------------------------------------------- minhash LSH


@pytest.fixture(scope="module")
def docs_pdf(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )


def _py_minhash_sigs(docs, n_perm=64, shingle_k=5, seed=42):
    from ieps_crawler_spark.operators.dedup import _minhash_params, _shingle_hashes

    a, b = _minhash_params(n_perm, seed)
    sigs = {}
    with np.errstate(over="ignore"):
        for doc_id, text in docs:
            h = _shingle_hashes(text, shingle_k)
            if len(h) == 0:
                sigs[doc_id] = [0] * n_perm
            else:
                # mirror the a*h+b mod 2^64 bijective family
                vals = np.outer(a, h) + b[:, None]
                sigs[doc_id] = [int(x) for x in vals.min(axis=1).view(np.int64)]
    return sigs


def _py_minhash_pairs(docs, n_perm=64, bands=16, shingle_k=5, threshold=0.5):
    """Slow oracle: same signatures, but banding/bucketing/verification
    re-done with plain dicts and loops — verifies the Spark band-explode,
    bucket join, pair dedup and zip_with agreement aggregate."""
    sigs = _py_minhash_sigs(docs, n_perm, shingle_k)
    r = n_perm // bands
    cand = set()
    for i in range(bands):
        buckets = {}
        for d, s in sigs.items():
            buckets.setdefault(tuple(s[i * r : (i + 1) * r]), []).append(d)
        for ds in buckets.values():
            ds.sort()
            for x in range(len(ds)):
                for y in range(x + 1, len(ds)):
                    cand.add((ds[x], ds[y]))
    out = {}
    for x, y in cand:
        est = sum(1 for p, q in zip(sigs[x], sigs[y]) if p == q) / n_perm
        if est >= threshold:
            out[(x, y)] = est
    return out


def test_minhash_lsh_matches_python_oracle(spark, docs_pdf):
    from ieps_crawler_spark.operators.dedup import minhash_lsh_dedup

    docs = spark.createDataFrame(docs_pdf)
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.5).collect()
    }
    want = _py_minhash_pairs(
        list(zip(docs_pdf["doc_id"], docs_pdf["text"])), threshold=0.5
    )
    assert set(got) == set(want)
    for k, v in got.items():
        assert abs(v - want[k]) < 1e-12


def test_minhash_lsh_finds_planted_neardups(spark, docs_pdf):
    """End-to-end semantic check: planted copies with a few words changed
    must surface as high-est-Jaccard pairs; unrelated docs must not."""
    from ieps_crawler_spark.operators.dedup import minhash_lsh_dedup

    base = docs_pdf.head(20).copy()
    planted = []
    rows = []
    for i, r in base.iterrows():
        rows.append((int(r["doc_id"]) * 2, r["text"]))
        words = r["text"].split()
        words[len(words) // 2] = "PLANTEDWORD"
        rows.append((int(r["doc_id"]) * 2 + 1, " ".join(words)))
        planted.append((int(r["doc_id"]) * 2, int(r["doc_id"]) * 2 + 1))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.6).collect()
    }
    found = sum(1 for p in planted if p in got)
    assert found >= len(planted) * 0.9, f"only {found}/{len(planted)} planted found"


# ----------------------------------------------------------------- simhash


def _py_simhash(text):
    """Independent reimplementation of dedup.simhash64: md5-token-hash
    simhash over distinct lowercased whitespace tokens."""
    import hashlib

    toks = {w for w in (text or "").lower().split() if w}
    if not toks:
        return 0
    v = [0] * 64
    for w in toks:
        h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16)
        for b in range(64):
            v[b] += 1 if (h >> b) & 1 else -1
    sim = 0
    for b in range(64):
        if v[b] > 0:
            sim |= 1 << b
    return sim - (1 << 64) if sim >= (1 << 63) else sim


def _py_simhash_pairs(docs, max_hamming=3):
    # simhash64 drops docs with no tokens (inner semantics)
    sims = {d: _py_simhash(t) for d, t in docs if (t or "").split()}
    cand = set()
    for seg in range(4):
        buckets = {}
        for d, s in sims.items():
            buckets.setdefault((s >> (seg * 16)) & 0xFFFF, []).append(d)
        for ds in buckets.values():
            ds.sort()
            for x in range(len(ds)):
                for y in range(x + 1, len(ds)):
                    cand.add((ds[x], ds[y]))
    out = {}
    for x, y in cand:
        ham = bin((sims[x] ^ sims[y]) & ((1 << 64) - 1)).count("1")
        if ham <= max_hamming:
            out[(x, y)] = ham
    return out


def test_simhash_matches_python_oracle(spark, docs_pdf):
    from ieps_crawler_spark.operators.dedup import simhash_dedup

    docs = spark.createDataFrame(docs_pdf)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_dedup(docs, "text", "doc_id", 3).collect()
    }
    want = _py_simhash_pairs(list(zip(docs_pdf["doc_id"], docs_pdf["text"])), 3)
    assert got == want


def test_simhash_finds_identical_twins(spark, docs_pdf):
    from ieps_crawler_spark.operators.dedup import simhash_dedup

    base = docs_pdf.head(10)
    rows = [(int(r["doc_id"]) * 2, r["text"]) for _, r in base.iterrows()]
    rows += [(int(r["doc_id"]) * 2 + 1, r["text"]) for _, r in base.iterrows()]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_dedup(docs, "text", "doc_id", 0).collect()
    }
    for _, r in base.iterrows():
        d = int(r["doc_id"])
        assert got.get((d * 2, d * 2 + 1)) == 0


# --------------------------------------------------- neardup_clusters


def test_neardup_clusters_min_id_canonical(spark):
    from ieps_crawler_spark.operators.dedup import neardup_clusters

    ents = spark.createDataFrame(
        [(i,) for i in range(1, 9)], "doc_id long"
    )
    # chain 1-2-3 (transitive), pair 5-6, singletons 4/7/8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in neardup_clusters(ents, pairs, "doc_id").collect()
    }
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),
        5: (5, True),
        6: (5, False),
        7: (7, True),
        8: (8, True),
    }


def test_neardup_clusters_prefer_col(spark):
    from ieps_crawler_spark.operators.dedup import neardup_clusters

    ents = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.5), (4, 0.2), (5, 0.7), (6, 0.7)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in neardup_clusters(ents, pairs, "doc_id", "quality").collect()
    }
    # cluster {1,2,3}: max quality = doc 2; {5,6}: quality tie -> min id 5
    assert got == {
        1: (1, False),
        2: (1, True),
        3: (1, False),
        4: (4, True),
        5: (5, True),
        6: (5, False),
    }


def test_neardup_clusters_one_kept_row_per_cluster(spark, emb):
    """Composition over the real pair generator: every cluster keeps
    exactly one canonical row, and every entity appears exactly once."""
    from ieps_crawler_spark.operators.dedup import (
        embedding_neardup,
        neardup_clusters,
    )

    pairs = embedding_neardup(emb, "vec_id", "embedding", 0.35)
    res = neardup_clusters(emb, pairs, "vec_id")
    agg = res.groupBy("cluster_id").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon")
    )
    assert agg.filter(F.col("n_canon") != 1).count() == 0
    assert res.count() == emb.count()
    assert res.select("vec_id").distinct().count() == emb.count()


# ------------------------------------------------ ngram containment

def test_containment_asymmetric_quote_case(spark):
    from ieps_crawler_spark.operators.dedup import ngram_containment_pairs

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally different words here")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r
        for r in ngram_containment_pairs(docs, pairs).collect()
    }
    r12 = got[(1, 2)]
    # the short doc is FULLY contained in the long one...
    assert r12["contain_a_pm"] == 1000
    # ...but the long one is mostly not contained in the short
    assert r12["contain_b_pm"] < 200
    # and its Jaccard would be low — exactly the case containment catches
    assert r12["n_common"] == r12["n_grams_a"]
    r13 = got[(1, 3)]
    assert r13["n_common"] == 0
    assert r13["contain_a_pm"] == 0 and r13["contain_b_pm"] == 0


def test_containment_python_oracle_and_partitions(spark):
    import random

    from ieps_crawler_spark.operators.dedup import ngram_containment_pairs

    rng = random.Random(41)
    vocab = [f"t{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(25))) for i in range(12)
    ]
    pairs = [(a, b) for a in range(12) for b in range(12) if a < b][:30]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")

    def py_grams(t, n=3):
        ws = t.lower().split()
        return {
            " ".join(ws[i : i + n])
            for i in range(max(len(ws) - n + 1, 1))
            if ws[i : i + n]
        }

    got = {
        (r["id_a"], r["id_b"]): (
            r["n_grams_a"], r["n_grams_b"], r["n_common"],
            r["contain_a_pm"], r["contain_b_pm"],
        )
        for r in ngram_containment_pairs(ddf, pdf).collect()
    }
    for a, b in pairs:
        ga, gb = py_grams(docs[a][1]), py_grams(docs[b][1])
        inter = len(ga & gb)
        assert got[(a, b)] == (
            len(ga), len(gb), inter,
            inter * 1000 // len(ga), inter * 1000 // len(gb),
        ), (a, b)
    again = {
        (r["id_a"], r["id_b"]): (
            r["n_grams_a"], r["n_grams_b"], r["n_common"],
            r["contain_a_pm"], r["contain_b_pm"],
        )
        for r in ngram_containment_pairs(
            ddf.repartition(7), pdf.repartition(3)
        ).collect()
    }
    assert got == again


def test_containment_short_doc_null_not_zero(spark):
    """Docs with < n words have no n-grams (word_ngrams' empty-array
    contract): their containment direction is null ('no signal'), never
    a fabricated 0 — a 2-word quote inside a long doc must not be
    reported as 'not contained' (round-2 review finding)."""
    from ieps_crawler_spark.operators.dedup import ngram_containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),  # 2 words < n=3: no grams
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 2)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): (
            r["n_grams_a"], r["contain_a_pm"], r["contain_b_pm"]
        )
        for r in ngram_containment_pairs(docs, pairs).collect()
    }
    # short doc: empty gram set, null both directions involving it
    assert got[(1, 2)] == (0, None, 0)
    # 3-word doc has exactly its whole-doc gram, fully contained in doc 2
    assert got[(3, 2)] == (1, 1000, 333)


def test_remove_duplicate_paragraphs_via_delim(spark):
    """Paragraph-level boilerplate pass (RefinedWeb dedups paragraphs,
    not only lines) = the same operator with delim='\\n\\n': the blank
    line is part of the separator, so multi-line paragraphs are the
    dedup unit and single shared LINES inside unique paragraphs
    survive."""
    from ieps_crawler_spark.operators.dedup import remove_duplicate_lines

    banner = "cookie notice\nclick accept"
    rows = [
        (1, banner + "\n\n" + "unique one\nshared line"),
        (2, banner + "\n\n" + "unique two\nshared line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           remove_duplicate_lines(df, delim="\n\n").collect()}
    # the banner PARAGRAPH (2 docs) dies; the paragraphs that share
    # only a line stay (they differ as whole paragraphs)
    assert out[1].text == "unique one\nshared line"
    assert out[2].text == "unique two\nshared line"
    assert out[1].n_removed == 1 and out[2].n_removed == 1
    # line-granular pass on the same input also kills the shared line
    line_out = {r.doc_id: r.text for r in
                remove_duplicate_lines(df, delim="\n").collect()}
    assert "shared line" not in line_out[1]
