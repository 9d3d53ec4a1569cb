"""OPIC adaptive-priority tests (operators/opic.py) — hand-computed
micro-cash on a 3-node graph, conservation, the incremental wave
update, and the priority_table-shaped host lanes."""

from pyspark.sql import functions as F

from ieps_crawler_spark.operators.opic import (
    MICRO,
    opic_host_lanes,
    opic_scores,
    opic_update,
)


def _edges(spark):
    # 1 -> 2, 1 -> 3, 2 -> 3; 3 dangles
    return spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "from_id long, to_id long"
    )


def test_opic_scores_hand_computed(spark):
    # iteration 1: node1 share 1e6 div 3 = 333,333 (to_root 333,334),
    # node2 share 500,000, node3 all-to-root; pot 1,833,334.
    # iteration 2: root redistributes 611,111 each + remainder 1 to
    # node 1; node2 gives 166,666/166,667; node3 banks 833,333.
    got = {
        r["node_id"]: (r["cash_mu"], r["history_mu"])
        for r in opic_scores(_edges(spark), iterations=2).collect()
    }
    assert got == {
        1: (611_112, 1_000_000),
        2: (611_111, 1_333_333),
        3: (777_777, 1_833_333),
    }


def test_opic_scores_conserves_total_cash(spark):
    """Drive _distribute directly (it keeps the virtual-root row the
    public API drops) and assert TOTAL cash — real nodes plus root —
    equals 3 * MICRO after every one of 3 chained steps."""
    from ieps_crawler_spark.operators.opic import VIRTUAL_ID, _distribute

    e = _edges(spark).selectExpr("from_id as s", "to_id as d")
    cash = spark.createDataFrame(
        [(1, MICRO, 0), (2, MICRO, 0), (3, MICRO, 0), (VIRTUAL_ID, 0, 0)],
        "node_id long, cash_mu long, history_mu long",
    )
    for _ in range(3):
        cash = _distribute(cash, e, "s", "d", n_nodes=3, min_id=1)
        assert cash.agg(F.sum("cash_mu")).collect()[0][0] == 3 * MICRO
    # k=2 exact split known from the hand computation: root holds 1e6
    res2 = opic_scores(_edges(spark), iterations=2)
    assert res2.agg(F.sum("cash_mu")).collect()[0][0] == 2 * MICRO


def test_opic_scores_rejects_zero_iterations_and_bad_ids(spark):
    import pytest

    with pytest.raises(ValueError):
        opic_scores(_edges(spark), iterations=0)
    # node ids at/below the virtual root id must be rejected loudly
    bad = spark.createDataFrame([(-1, 2)], "from_id long, to_id long")
    with pytest.raises(ValueError, match="virtual"):
        opic_scores(bad, iterations=1)


def test_opic_scores_empty_and_selfloop_only_graphs(spark):
    empty = spark.createDataFrame([], "from_id long, to_id long")
    assert opic_scores(empty, iterations=2).count() == 0
    # self-loops are dropped; a graph of ONLY self-loops is empty too
    loops = spark.createDataFrame([(5, 5)], "from_id long, to_id long")
    assert opic_scores(loops, iterations=1).count() == 0


def test_opic_scores_selfloop_ignored(spark):
    # adding a self-loop must not change anyone's scores
    base = opic_scores(_edges(spark), iterations=2).collect()
    withloop = opic_scores(
        _edges(spark).union(
            spark.createDataFrame([(2, 2)], "from_id long, to_id long")
        ),
        iterations=2,
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, withloop))


def test_opic_update_distributes_wave_cash(spark):
    cash = spark.createDataFrame(
        [("A", 1_000_001, 0), ("B", 1_000_000, 0)],
        "url string, cash_mu long, history_mu long",
    )
    links = spark.createDataFrame(
        [("A", "B"), ("A", "C")], "from_url string, to_url string"
    )
    fetched = spark.createDataFrame([("A",)], "url string")
    got = {
        r["url"]: (r["cash_mu"], r["history_mu"])
        for r in opic_update(cash, links, fetched).collect()
    }
    # A banked 1,000,001 into history; share 500,000 each, remainder 1
    # to the lexically lowest destination (B); C enters the table new.
    assert got == {
        "A": (0, 1_000_001),
        "B": (1_500_001, 0),
        "C": (500_000, 0),
    }


def test_opic_update_dangling_fetch_banks_cash(spark):
    cash = spark.createDataFrame(
        [("A", 700, 5)], "url string, cash_mu long, history_mu long"
    )
    links = spark.createDataFrame(
        [], "from_url string, to_url string"
    )
    fetched = spark.createDataFrame([("A",)], "url string")
    got = opic_update(cash, links, fetched).collect()
    assert [(r["url"], r["cash_mu"], r["history_mu"]) for r in got] == [
        ("A", 0, 705)
    ]


def test_opic_update_selfloop_banks_like_dangling(spark):
    cash = spark.createDataFrame(
        [("A", 800, 0)], "url string, cash_mu long, history_mu long"
    )
    links = spark.createDataFrame(
        [("A", "A"), ("A", "B")], "from_url string, to_url string"
    )
    fetched = spark.createDataFrame([("A",)], "url string")
    got = {
        r["url"]: (r["cash_mu"], r["history_mu"])
        for r in opic_update(cash, links, fetched).collect()
    }
    # the self-link is dropped: B gets ALL 800, nothing strands on A
    assert got == {"A": (0, 800), "B": (800, 0)}


def test_opic_update_ignores_links_from_unfetched(spark):
    cash = spark.createDataFrame(
        [("A", 100, 0), ("B", 100, 0)],
        "url string, cash_mu long, history_mu long",
    )
    links = spark.createDataFrame(
        [("B", "C")], "from_url string, to_url string"
    )
    fetched = spark.createDataFrame([("A",)], "url string")
    got = {
        r["url"]: (r["cash_mu"], r["history_mu"])
        for r in opic_update(cash, links, fetched).collect()
    }
    assert got == {"A": (0, 100), "B": (100, 0)}


def test_opic_feedback_crawl_same_closure(spark, tmp_path):
    """Full loop: crawl -> OPIC cash over the measured link graph ->
    host lanes -> re-crawl with the lanes as priority_table. Priority
    changes scheduling, never coverage: the re-crawl must converge to
    the identical seen set and per-URL classification."""
    from ieps_crawler_spark.corpus import generate_corpus
    from ieps_crawler_spark.plans.crawl import Crawler

    corpus = generate_corpus(100, seed=11)
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {
        r["url"]: r["content"] for _, r in corpus["sitemap_bodies"].iterrows()
    }

    def crawl(ckpt, **kw):
        c = Crawler(spark, pages, sites, bodies, ckpt, wave_seconds=60, **kw)
        st = c.run(seeds=corpus["seeds"], max_waves=14)
        assert st.waves < 14
        return c

    base = crawl(str(tmp_path / "base"))
    fetched = base.results().select(F.col("url"))
    seed_cash = fetched.select(
        "url",
        F.lit(MICRO).cast("long").alias("cash_mu"),
        F.lit(0).cast("long").alias("history_mu"),
    )
    cash = opic_update(
        seed_cash,
        base.links().select(
            F.col("from_url"), F.col("to_url")
        ),
        fetched,
    )
    lanes = opic_host_lanes(
        cash, F.parse_url(F.col("url"), F.lit("HOST")), n_lanes=3
    ).select("host", "priority")

    rerun = crawl(str(tmp_path / "opic"), priority_table=lanes)
    base_t = {
        r["url"]: r["page_type"] for r in base.results().collect()
    }
    rerun_t = {
        r["url"]: r["page_type"] for r in rerun.results().collect()
    }
    assert rerun_t == base_t


def test_opic_host_lanes_priority_shape(spark):
    cash = spark.createDataFrame(
        [
            ("http://a.si/1", 900, 0),
            ("http://a.si/2", 900, 0),
            ("http://b.si/1", 500, 0),
            ("http://c.si/1", 10, 0),
        ],
        "url string, cash_mu long, history_mu long",
    )
    lanes = opic_host_lanes(
        cash, F.parse_url(F.col("url"), F.lit("HOST")), n_lanes=2
    )
    got = {r["host"]: r["priority"] for r in lanes.collect()}
    # a.si (1800) and b.si (500) land in lane 0, c.si in lane 1
    assert got == {"a.si": 0, "b.si": 0, "c.si": 1}
    assert lanes.columns[:2] == ["host", "priority"]  # priority_table shape


def test_opic_host_lanes_empty_cash(spark):
    # wave 0 / all-filtered wave: the percentile sketch returns null —
    # lanes must come back empty, not crash on cuts[i]
    empty = spark.createDataFrame(
        [], "url string, cash_mu long, history_mu long"
    )
    lanes = opic_host_lanes(
        empty, F.parse_url(F.col("url"), F.lit("HOST")), n_lanes=4
    )
    assert lanes.collect() == []
    assert lanes.columns[:2] == ["host", "priority"]
