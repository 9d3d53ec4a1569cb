"""Redirect-chain resolution (operators/redirects.py) and re-crawl
snapshot diffing (operators/politeness.snapshot_diff): chains, cycles,
self-loops, hop budgets, multi-edge determinization, pointer-doubling
round count; full-outer hash diff incl. null-hash semantics."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.operators.politeness import snapshot_diff
from ieps_crawler_spark.operators.redirects import resolve_redirect_chains


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_url string, dst_url string")


def _resolve(spark, pairs, **kw):
    out = resolve_redirect_chains(_edges(spark, pairs), **kw)
    return {
        r["src_url"]: (r["final_url"], r["n_hops"], r["resolved"])
        for r in out.collect()
    }


def test_simple_chain_exact_hops(spark):
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        "a": ("d", 3, True),
        "b": ("d", 2, True),
        "c": ("d", 1, True),
    }


def test_long_chain_collapses_in_log_rounds(spark):
    # 12-hop chain needs pointer doubling, not 12 sequential joins
    pairs = [(f"n{i}", f"n{i+1}") for i in range(12)]
    got = _resolve(spark, pairs, max_hops=16)
    assert got["n0"] == ("n12", 12, True)
    assert got["n11"] == ("n12", 1, True)


def test_cycle_and_self_loop_unresolved(spark):
    got = _resolve(
        spark,
        [("x", "y"), ("y", "z"), ("z", "x"), ("s", "s"), ("in", "x")],
    )
    for u in ["x", "y", "z", "s", "in"]:
        assert got[u] == (None, None, False), (u, got[u])


def test_over_budget_chain_unresolved(spark):
    pairs = [(f"n{i}", f"n{i+1}") for i in range(5)]
    got = _resolve(spark, pairs, max_hops=3)
    assert got["n0"] == (None, None, False)  # 5 hops > 3
    assert got["n4"] == ("n5", 1, True)
    assert got["n2"] == ("n5", 3, True)  # exactly at budget


def test_multi_edge_determinized_to_min_target(spark):
    got = _resolve(spark, [("a", "c"), ("a", "b")])
    assert got["a"] == ("b", 1, True)


def test_max_hops_validation(spark):
    with pytest.raises(ValueError):
        resolve_redirect_chains(_edges(spark, [("a", "b")]), max_hops=0)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_snapshot_diff_all_states(spark):
    old = _snap(
        spark,
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3"), ("u4", None), ("u5", None)],
    )
    new = _snap(
        spark,
        [("u1", "h1"), ("u2", "hX"), ("u4", None), ("u5", "h5"), ("u6", "h6")],
    )
    got = {
        r["url"]: r["change"] for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "gone",
        "u4": "unchanged",  # failed both times: null == null
        "u5": "changed",  # failed -> fetched
        "u6": "added",
    }


def test_snapshot_diff_row_per_union_key(spark):
    old = _snap(spark, [("a", "1")])
    new = _snap(spark, [("b", "2")])
    rows = snapshot_diff(old, new).collect()
    assert len(rows) == 2
    assert {r["url"] for r in rows} == {"a", "b"}
