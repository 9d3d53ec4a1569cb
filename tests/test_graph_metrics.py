"""Report-§4 graph metrics (VERDICT r2 missing #3): avg degree,
approximate diameter (double-sweep BFS bound), local clustering
coefficient — the remaining rows of the reference's published
link-graph table (report/report.tex:228-232, computed there in Gephi).

Hand-computed fixtures: triangle-with-tail, 4-cycle, K4."""

import pytest

from ieps_crawler_spark.operators.graph import (
    approx_diameter,
    clustering_coefficients,
    degree_stats,
    hits,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "from_id long, to_id long")


@pytest.fixture(scope="module")
def tri_tail(spark):
    # triangle 1-2-3 plus tail 3-4 (directed as written; metrics that
    # need undirected symmetrize internally)
    return _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])


def test_degree_stats(spark, tri_tail):
    row = degree_stats(tri_tail).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 4
    assert row["avg_out_degree_permille"] == 1000
    assert row["max_out_degree"] == 2  # node 1 -> {2, 3}
    assert row["max_in_degree"] == 2  # node 3 <- {1, 2}


def test_degree_stats_dedups_edges(spark):
    row = degree_stats(
        _edges(spark, [(1, 2), (1, 2), (2, 1)])
    ).collect()[0]
    assert row["n_edges"] == 2 and row["n_nodes"] == 2


def test_clustering_triangle_with_tail(spark, tri_tail):
    got = {
        r["node_id"]: (r["degree"], r["triangles"], r["coeff_permille"])
        for r in clustering_coefficients(tri_tail).collect()
    }
    assert got == {
        1: (2, 1, 1000),
        2: (2, 1, 1000),
        3: (3, 1, 333),
        4: (1, 0, 0),
    }


def test_clustering_square_no_triangles(spark):
    sq = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    got = clustering_coefficients(sq).collect()
    assert all(r["triangles"] == 0 and r["coeff_permille"] == 0 for r in got)
    assert all(r["degree"] == 2 for r in got)


def test_clustering_k4(spark):
    k4 = _edges(
        spark, [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    )
    got = clustering_coefficients(k4).collect()
    assert all(
        (r["degree"], r["triangles"], r["coeff_permille"]) == (3, 3, 1000)
        for r in got
    )


def test_clustering_ignores_direction_and_self_loops(spark):
    # same triangle written with reversed/self edges must not change T
    messy = _edges(spark, [(2, 1), (3, 2), (1, 3), (1, 1), (3, 3)])
    got = {
        r["node_id"]: r["triangles"]
        for r in clustering_coefficients(messy).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_approx_diameter_tri_tail(spark, tri_tail):
    row = approx_diameter(tri_tail).collect()[0]
    assert row["start_node"] == 1
    assert row["ecc_start"] == 2  # 1 -> 3 -> 4
    assert row["far_node"] == 4
    assert row["diameter_lb"] == 2
    assert row["n_reached"] == 4


def test_approx_diameter_path_exact(spark):
    # on a path graph double-sweep is exact: 0-1-2-3-4-5 diameter 5
    path = _edges(spark, [(i, i + 1) for i in range(5)])
    row = approx_diameter(path).collect()[0]
    assert row["diameter_lb"] == 5
    assert row["far_node"] == 5
    assert row["n_reached"] == 6


def test_approx_diameter_covers_start_component_only(spark):
    two = _edges(spark, [(1, 2), (10, 11), (11, 12)])
    row = approx_diameter(two).collect()[0]
    assert row["start_node"] == 1
    assert row["n_reached"] == 2
    assert row["diameter_lb"] == 1


def test_approx_diameter_selfloop_only_returns_empty(spark):
    # no non-self-loop edge -> no path of length > 0: zero rows with
    # the full schema, never an IndexError
    out = approx_diameter(_edges(spark, [(1, 1), (2, 2)]))
    assert out.count() == 0
    assert out.columns == [
        "start_node", "ecc_start", "far_node", "diameter_lb", "n_reached",
    ]
    empty = approx_diameter(
        spark.createDataFrame([], "from_id long, to_id long")
    )
    assert empty.count() == 0


def test_approx_diameter_string_ids(spark):
    # id-type-agnostic like the module's other operators: string URLs
    # flow through the sweep pivots without an int() cast
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "from_id string, to_id string"
    )
    row = approx_diameter(path).collect()[0]
    assert row["start_node"] == "a"
    assert row["far_node"] == "d"
    assert row["diameter_lb"] == 3
    assert row["n_reached"] == 4


def test_hits_rejects_zero_iterations(spark, tri_tail):
    with pytest.raises(ValueError):
        hits(tri_tail, iterations=0)
