"""HyperBall tests (operators/hyperball.py): exact agreement with a
pure-Python register/estimate replica on a path graph, effective
diameter saturation on the corrected curve, harmonic centrality."""

import hashlib
import math

import pytest

from ieps_crawler_spark.operators.hyperball import (
    effective_diameter,
    harmonic_centrality,
    hyperball,
    neighborhood_function,
)

BH, RH = 2, 12  # bucket_hex, rank_hex (m = 256)
M = 16 ** BH


def _py_regs(ids):
    regs = {}
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()
        b = h[:BH]
        bits = bin(int(h[BH : BH + RH], 16))[2:].zfill(RH * 4)
        pos = bits.find("1")
        rank = RH * 4 + 1 if pos < 0 else pos + 1
        regs[b] = max(regs.get(b, 0), rank)
    return regs


def _py_est(ids):
    w = RH * 4
    alpha = 0.7213 / (1 + 1.079 / M)
    regs = _py_regs(ids)
    s = sum(1 << (w + 1 - reg) for reg in regs.values())
    harm = s + (M - len(regs)) * (1 << (w + 1))
    est = math.floor(alpha * M * M * float(1 << (w + 1)) / harm)
    zeros = M - len(regs)
    lc = (
        M * math.log(M / zeros)
        if est <= 2.5 * M and zeros > 0
        else float(est)
    )
    return harm, zeros, est, lc


# directed path 1 -> 2 -> 3; out-balls:
# r0: {1} {2} {3} | r1: {1,2} {2,3} {3} | r2: {1,2,3} {2,3} {3}
BALLS = {
    0: {1: [1], 2: [2], 3: [3]},
    1: {1: [1, 2], 2: [2, 3], 3: [3]},
    2: {1: [1, 2, 3], 2: [2, 3], 3: [3]},
}


def _path(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3)], "from_id long, to_id long"
    )


def test_hyperball_matches_python_replica(spark):
    got = {
        (r["node_id"], r["r"]): r
        for r in hyperball(_path(spark), radius=2).collect()
    }
    for r, balls in BALLS.items():
        for v, ball in balls.items():
            harm, zeros, est, lc = _py_est(ball)
            row = got[(v, r)]
            assert (row["harm_num"], row["n_zero_buckets"], row["ball_est"]) \
                == (harm, zeros, est)
            assert row["ball_lc"] == pytest.approx(lc, rel=1e-12)
    assert len(got) == 9


def test_neighborhood_function_and_effective_diameter(spark):
    hb = hyperball(_path(spark), radius=3)
    nf = {
        r["r"]: r["n_reach_est"]
        for r in neighborhood_function(hb).collect()
    }
    want = {
        r: sum(_py_est(b)[3] for b in balls.values())
        for r, balls in BALLS.items()
    }
    want[3] = want[2]  # saturated
    for r in want:
        assert nf[r] == pytest.approx(want[r], rel=1e-12)
    # the corrected curve strictly grows until the closure is reached
    assert nf[0] < nf[1] < nf[2]
    eff, saturated = effective_diameter(hb, q=1.0)
    assert (eff, saturated) == (2, True)


def test_effective_diameter_unsaturated_flag(spark):
    hb = hyperball(_path(spark), radius=1)  # curve still growing
    _, saturated = effective_diameter(hb, q=1.0)
    assert saturated is False


def test_harmonic_centrality(spark):
    hb = hyperball(_path(spark), radius=2)
    got = {
        r["node_id"]: r["harmonic_centrality"]
        for r in harmonic_centrality(hb).collect()
    }

    def hc(v):
        total = 0.0
        for r in (1, 2):
            d = _py_est(BALLS[r][v])[3] - _py_est(BALLS[r - 1][v])[3]
            total += max(d, 0.0) / r
        return round(total, 6)

    for v in (1, 2, 3):
        assert got[v] == pytest.approx(hc(v), abs=2e-6)
    # terminal node reaches nobody; the path head reaches the most
    assert got[3] == 0.0 and got[1] > got[2] > got[3]


def test_hyperball_selfloop_invariance_and_radius_guard(spark):
    base = sorted(map(tuple, hyperball(_path(spark), radius=2).collect()))
    withloop = sorted(
        map(
            tuple,
            hyperball(
                _path(spark).union(
                    spark.createDataFrame([(2, 2)], "from_id long, to_id long")
                ),
                radius=2,
            ).collect(),
        )
    )
    assert base == withloop
    with pytest.raises(ValueError):
        hyperball(_path(spark), radius=0)
    with pytest.raises(ValueError, match="q must be"):
        effective_diameter(hyperball(_path(spark), radius=1), q=1.5)


def test_hyperball_selfloop_only_node_keeps_singleton_ball(spark):
    """A node whose ONLY edge is a self-loop stays in the node set with
    a frozen singleton ball at every radius."""
    edges = spark.createDataFrame(
        [(1, 2), (3, 3)], "from_id long, to_id long"
    )
    got = {
        (r["node_id"], r["r"]): r["ball_est"]
        for r in hyperball(edges, radius=2).collect()
    }
    est3 = _py_est([3])[2]
    assert got[(3, 0)] == est3 and got[(3, 1)] == est3 and got[(3, 2)] == est3
    assert {(n, r) for n, r in got} == {
        (n, r) for n in (1, 2, 3) for r in (0, 1, 2)
    }
