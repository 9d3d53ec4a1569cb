"""SemDeDup (Abbas et al. 2023) — semantic dedup via codebook
clustering + within-cluster cosine pruning, keep = farthest-from-
centroid (the paper's rule: drop prototypical copies, keep the
outlier).

Hand-computed 2-D fixture: two orthogonal centroids, near-dup fans
around each, one equidistant tie-break vector, and a cross-cluster
near-dup pair that must NOT be merged (cluster confinement is the
SemDeDup approximation under test)."""

import pytest

from ieps_crawler_spark.operators.dedup import semantic_dedup

# (vec_id, [x, y]) — centroids are rows 0 and 10
VECS = [
    (0, [1.0, 0.0]),     # centroid 0; cos_c = 1.0
    (1, [4.0, 0.0]),     # dup of 0 (cos 1.0); cos_c = 1.0
    (2, [1.0, 0.1]),     # near-dup (cos ~.995); cos_c ~.995 -> KEPT
    (3, [0.6, 0.6]),     # ties c0/c1 -> lowest j = 0; singleton in A
    (10, [0.0, 1.0]),    # centroid 1; cos_c = 1.0
    (11, [0.0, 5.0]),    # dup of 10; cos_c = 1.0
    (12, [0.1, 1.0]),    # near-dup; cos_c ~.995 -> KEPT
    (13, [0.55, 0.65]),  # cluster B; cos(3,13) ~.997 but cross-cluster
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def result(emb):
    rows = semantic_dedup(emb, [0, 10], threshold=0.95).collect()
    return {r["vec_id"]: r for r in rows}


def test_one_row_per_vector(result):
    assert sorted(result) == [0, 1, 2, 3, 10, 11, 12, 13]


def test_cluster_assignment_and_tiebreak(result):
    assert {i: result[i]["list_id"] for i in result} == {
        0: 0, 1: 0, 2: 0, 3: 0,  # 3: exact c0/c1 tie -> lowest j
        10: 1, 11: 1, 12: 1, 13: 1,
    }


def test_groups_are_min_reachable_id(result):
    assert {i: result[i]["group_id"] for i in result} == {
        0: 0, 1: 0, 2: 0, 3: 3, 10: 10, 11: 10, 12: 10, 13: 13,
    }


def test_keep_rule_farthest_from_centroid(result):
    # groups {0,1,2} and {10,11,12}: members 2 / 12 have the lowest
    # cosine to their centroid -> kept; prototypes dropped
    kept = sorted(i for i in result if result[i]["is_kept"])
    assert kept == [2, 3, 12, 13]


def test_cross_cluster_neardup_not_merged(result):
    # cos(3, 13) ~ 0.997 >= threshold, but they sit in different
    # clusters: SemDeDup never pairs across clusters, both survive
    assert result[3]["group_id"] == 3 and result[13]["group_id"] == 13
    assert result[3]["is_kept"] and result[13]["is_kept"]


def test_cos_centroid_values(result):
    assert result[0]["cos_centroid"] == pytest.approx(1.0)
    assert result[1]["cos_centroid"] == pytest.approx(1.0)
    assert result[2]["cos_centroid"] == pytest.approx(
        1.0 / (1.01) ** 0.5, rel=1e-9
    )
    assert result[3]["cos_centroid"] == pytest.approx(
        0.6 / (0.72) ** 0.5, rel=1e-9
    )


def test_codebook_dataframe_form(emb, spark, result):
    # passing an explicit (j, cv) frame gives byte-identical output
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "j int, cv array<double>"
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, cents, threshold=0.95).collect()
    }
    assert {
        (i, r["list_id"], r["group_id"], r["is_kept"])
        for i, r in rows.items()
    } == {
        (i, r["list_id"], r["group_id"], r["is_kept"])
        for i, r in result.items()
    }


def test_all_singletons_empty_pair_graph(emb):
    # threshold above every within-cluster cosine -> zero pairs; the
    # components path must handle an empty edge frame and every vector
    # survives as its own group
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, [0, 10], threshold=1.000001).collect()
    }
    assert len(rows) == len(VECS)
    assert all(r["group_id"] == i for i, r in rows.items())
    assert all(r["is_kept"] for r in rows.values())


def test_plan_is_jvm_only(emb):
    # the only nested-loop shape is the broadcast cross against the
    # BOUNDED codebook (the same allowlisted shape as ivf_topk's
    # assignment); no Python stage anywhere
    from ieps_crawler_spark.plans.audit import assert_scale_safe

    counts = assert_scale_safe(
        semantic_dedup(emb, [0, 10], threshold=0.95),
        allow=("BroadcastNestedLoopJoin",),
    )
    assert counts["python_stages"] == 0
