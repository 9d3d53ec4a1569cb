"""Graph analytics tests (VERDICT r1: connected_components had neither
an oracle nor a unit test). Oracle = pure-Python union-find."""

import pytest
from pyspark.sql import functions as F


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc(spark, edges):
    from ieps_crawler_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "from_id long, to_id long")
    got = {
        r["node_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    # min-reachable-id canonical form for the union-find oracle
    want_root = _union_find(edges)
    comp_members = {}
    for n, r in want_root.items():
        comp_members.setdefault(r, []).append(n)
    want = {n: min(comp_members[r]) for n, r in want_root.items()}
    return got, want


def test_components_toy_shapes(spark):
    edges = (
        [(1, 2), (2, 3), (3, 1)]          # triangle
        + [(10, 11), (11, 12)]            # path
        + [(20, 21)]                      # pair
        + [(30, 30)]                      # self-loop singleton
    )
    got, want = _cc(spark, edges)
    assert got == want


def test_components_long_chain_converges(spark):
    """A 300-node chain needs ~300 plain min-propagation rounds; pointer
    jumping must converge it within the 40-iteration cap."""
    edges = [(i, i + 1) for i in range(300)]
    got, want = _cc(spark, edges)
    assert got == want
    assert set(got.values()) == {0}


def test_components_match_union_find_on_toy_graph(spark, sf_dir):
    from ieps_crawler_spark.operators.graph import connected_components

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges_df = li.select(
        F.pmod(F.col("l_orderkey"), F.lit(1000)).alias("from_id"),
        F.pmod(F.col("l_partkey"), F.lit(1000)).alias("to_id"),
    ).dropDuplicates(["from_id", "to_id"])
    edges = [(r["from_id"], r["to_id"]) for r in edges_df.collect()]
    got = {
        r["node_id"]: r["component"]
        for r in connected_components(edges_df).collect()
    }
    want_root = _union_find(edges)
    comp_members = {}
    for n, r in want_root.items():
        comp_members.setdefault(r, []).append(n)
    want = {n: min(comp_members[r]) for n, r in want_root.items()}
    assert got == want


def test_components_release_caches(spark):
    """No cache-manager entries may outlive the call (ADVICE r1 leak):
    the edge cache must be unpersisted in the finally; iteration state
    uses localCheckpoint (ContextCleaner-managed), never cache()."""
    from ieps_crawler_spark.operators.graph import connected_components

    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(200)], "from_id long, to_id long"
    )
    out = connected_components(df)
    out.count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


# ------------------------------------------------------------------ HITS

def _py_hits(edges, iters=2):
    from collections import defaultdict

    e = sorted(set(edges))
    nodes = {u for u, _ in e} | {v for _, v in e}
    h = {n: 1 for n in nodes}
    a = {}
    for _ in range(iters):
        a = defaultdict(int)
        for u, v in e:
            a[v] += h.get(u, 0)
        h2 = defaultdict(int)
        for u, v in e:
            h2[u] += a[v]
        h = h2
    return {n: (h.get(n, 0), a.get(n, 0)) for n in nodes}


def test_hits_python_oracle(spark):
    import random

    from ieps_crawler_spark.operators.graph import hits

    rng = random.Random(31)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    df = spark.createDataFrame(edges, "from_id long, to_id long")
    got = {r["node_id"]: (r["hub"], r["auth"]) for r in hits(df).collect()}
    assert got == _py_hits(edges)


def test_hits_hub_authority_shape(spark):
    from ieps_crawler_spark.operators.graph import hits

    # star: 0 links to 1..5 (pure hub); 6..8 link to 9 (pure authority)
    edges = [(0, i) for i in range(1, 6)] + [(i, 9) for i in (6, 7, 8)]
    df = spark.createDataFrame(edges, "from_id long, to_id long")
    got = {r["node_id"]: (r["hub"], r["auth"]) for r in hits(df).collect()}
    assert got[0][0] > 0 and got[0][1] == 0  # hub only
    assert got[9][1] > 0 and got[9][0] == 0  # authority only
    assert got == _py_hits(edges)


def test_hits_partition_independent(spark):
    import random

    from ieps_crawler_spark.operators.graph import hits

    rng = random.Random(37)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(120)]
    df = spark.createDataFrame(edges, "from_id long, to_id long")
    a = sorted(map(tuple, hits(df).collect()))
    b = sorted(map(tuple, hits(df.repartition(7)).collect()))
    assert a == b
