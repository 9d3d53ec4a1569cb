"""trustrank + domain_graph (operators/graph.py round-3 additions)."""

import pytest
from pyspark.sql import functions as F

from ieps_crawler_spark.operators.graph import (
    domain_graph,
    pagerank,
    trustrank,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "from_id long, to_id long")


def test_trustrank_spam_island_is_zero(spark):
    # 1->2->3->1 cycle (1 trusted), 4->5 (4 trusted), 9->1 spam feeder,
    # 7->8 island with no trust at all
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (4, 5), (9, 1), (7, 8)])
    t = spark.createDataFrame([(1,), (4,)], "node_id long")
    out = {r.node_id: r.trustrank for r in trustrank(e, t, 3).collect()}
    assert out[9] == 0.0 and out[7] == 0.0 and out[8] == 0.0
    assert out[1] > out[2] > 0.0  # trusted source outranks downstream
    assert out[5] > 0.0  # reachable from trust in one hop


def test_trustrank_mass_bounded_by_one(spark):
    e = _edges(spark, [(1, 2), (2, 1), (2, 3)])
    t = spark.createDataFrame([(1,), (2,)], "node_id long")
    out = trustrank(e, t, 5)
    total = out.agg(F.sum("trustrank")).first()[0]
    # no (1-d) floor: total mass <= 1 (leaks only via dangling node 3)
    assert 0.0 < total <= 1.0 + 1e-12


def test_trustrank_uniform_trust_equals_scaled_pagerank(spark):
    # when EVERY node is trusted, t(v) = 1/n and the recurrence is
    # pagerank's scaled by 1/n (pagerank uses rank0=1, floor (1-d)*1)
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3)])
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node_id long")
    tr = {r.node_id: r.trustrank for r in trustrank(e, nodes, 3).collect()}
    pr = {r.node_id: r.pagerank for r in pagerank(e, 3).collect()}
    for n in (1, 2, 3):
        assert tr[n] == pytest.approx(pr[n] / 3.0, rel=1e-12)


def test_trustrank_zero_iterations_raises(spark):
    e = _edges(spark, [(1, 2)])
    t = spark.createDataFrame([(1,)], "node_id long")
    with pytest.raises(ValueError):
        trustrank(e, t, 0)


def test_trustrank_trusted_node_outside_edge_set(spark):
    # a trusted node with no edges still appears, holding its teleport
    e = _edges(spark, [(1, 2)])
    t = spark.createDataFrame([(99,)], "node_id long")
    out = {r.node_id: r.trustrank for r in trustrank(e, t, 2).collect()}
    assert out[99] == pytest.approx(0.15, rel=1e-9)  # (1-d)*1, no inflow
    assert out[1] == 0.0  # untrusted, no trusted in-links


def _host_edges(spark, rows):
    return spark.createDataFrame(rows, "src_host string, dst_host string")


def test_domain_graph_collapses_subdomains(spark):
    e = _host_edges(spark, [
        ("www.a.gov.si", "b.co.uk"),
        ("sub.a.gov.si", "b.co.uk"),
        ("sub.a.gov.si", "cdn.b.co.uk"),
        ("www.a.gov.si", "x.a.gov.si"),   # intra-domain -> dropped
    ])
    out = {(r.src_pld, r.dst_pld): (r.n_links, r.n_src_hosts)
           for r in domain_graph(e).collect()}
    assert out == {("a.gov.si", "b.co.uk"): (3, 2)}


def test_domain_graph_keeps_self_edges_when_asked(spark):
    e = _host_edges(spark, [("www.a.com", "b.a.com")])
    out = domain_graph(e, drop_self=False).collect()
    assert len(out) == 1 and out[0].src_pld == "a.com"
    assert domain_graph(e).count() == 0


def test_domain_graph_fallback_and_ip_units(spark):
    e = _host_edges(spark, [
        ("intranet", "b.co.uk"),          # single label -> lower(host)
        ("93.184.216.34", "b.co.uk"),     # IP literal = its own unit
        ("10.77.216.34", "b.co.uk"),      # distinct IP stays distinct
    ])
    out = {r.src_pld for r in domain_graph(e).collect()}
    assert out == {"intranet", "93.184.216.34", "10.77.216.34"}


def test_domain_graph_case_folds_hosts(spark):
    e = _host_edges(spark, [
        ("WWW.A.gov.si", "B.co.uk"),
        ("www.a.GOV.SI", "b.CO.UK"),
    ])
    rows = domain_graph(e).collect()
    assert len(rows) == 1
    r = rows[0]
    # both spellings are ONE source host after case-folding
    assert (r.n_links, r.n_src_hosts) == (2, 1)


def test_spam_mass_extremes(spark):
    from ieps_crawler_spark.operators.graph import spam_mass

    # two disjoint islands: trusted cycle 1<->2; spam chain 8->9
    e = _edges(spark, [(1, 2), (2, 1), (8, 9)])
    t = spark.createDataFrame([(1,), (2,)], "node_id long")
    out = {r.node_id: r for r in spam_mass(e, t, 3).collect()}
    # trust-island nodes: some rank comes from the (1-d) PR floor that
    # trustrank lacks, but mass must be far below the spam island's
    assert out[8].spam_mass == 1.0 and out[9].spam_mass == 1.0
    assert out[1].spam_mass < 0.75 and out[2].spam_mass < 0.75
    # pagerank column matches standalone pagerank
    pr = {r.node_id: r.pagerank for r in pagerank(e, 3).collect()}
    for n_id, row in out.items():
        assert row.pagerank == pr[n_id]


def test_spam_mass_zero_when_everyone_trusted(spark):
    import pytest as _pt

    from ieps_crawler_spark.operators.graph import spam_mass

    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3)])
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node_id long")
    for r in spam_mass(e, nodes, 3).collect():
        # TR*n == PR exactly when everyone is trusted -> mass ~ 0
        assert r.spam_mass == _pt.approx(0.0, abs=1e-9)
        assert r.trustrank_scaled == _pt.approx(r.pagerank, rel=1e-12)


def test_domain_graph_null_hosts_excluded_consistently(spark):
    e = _host_edges(spark, [
        ("www.a.com", "b.com"),
        (None, "b.com"),
        ("www.a.com", None),
    ])
    # NULL-host edges are excluded in BOTH modes (drop_self must only
    # control intra-domain edges, never NULL visibility)
    for kw in ({}, {"drop_self": False}):
        rows = domain_graph(e, **kw).collect()
        assert len(rows) == 1
        assert (rows[0].src_pld, rows[0].dst_pld) == ("a.com", "b.com")


def test_spam_mass_keeps_offgraph_trusted_nodes(spark):
    from ieps_crawler_spark.operators.graph import spam_mass

    e = _edges(spark, [(1, 2)])
    t = spark.createDataFrame([(99,)], "node_id long")
    out = {r.node_id: r for r in spam_mass(e, t, 3).collect()}
    # the off-graph trusted node is present: isolated-node PR floor,
    # zero spam mass (it IS the trust core)
    assert set(out) == {1, 2, 99}
    assert out[99].pagerank == pytest.approx(0.15, rel=1e-12)
    assert out[99].spam_mass == 0.0
    # nothing is reachable from the trust core -> full mass elsewhere
    assert out[1].spam_mass == 1.0 and out[2].spam_mass == 1.0


def test_trust_priority_feedback_crawl_same_closure(spark, tmp_path):
    """Crawl -> PLD domain graph from the measured link table ->
    TrustRank seeded at the seed-list PLDs -> host priority lanes ->
    re-crawl with the lanes as priority_table. Like the OPIC feedback
    loop (tests/test_opic.py): trust-derived priority changes
    scheduling, never coverage — identical seen set and per-URL
    classification."""
    from ieps_crawler_spark.corpus import generate_corpus
    from ieps_crawler_spark.operators.graph import (
        domain_graph,
        seed_plds,
        trustrank,
    )
    from ieps_crawler_spark.plans.crawl import Crawler
    from ieps_crawler_spark.functions.domains import (
        registrable_domain as _rd,
    )

    corpus = generate_corpus(100, seed=13)
    pages = spark.createDataFrame(corpus["pages"])
    sites = spark.createDataFrame(corpus["sites"])
    bodies = {
        r["url"]: r["content"]
        for _, r in corpus["sitemap_bodies"].iterrows()
    }

    def crawl(ckpt, **kw):
        c = Crawler(spark, pages, sites, bodies, ckpt, wave_seconds=60, **kw)
        st = c.run(seeds=corpus["seeds"], max_waves=14)
        assert st.waves < 14
        return c

    base = crawl(str(tmp_path / "base"))

    # measured URL link graph -> host edges -> PLD domain graph
    host_edges = base.links().select(
        F.parse_url(F.col("from_url"), F.lit("HOST")).alias("src_host"),
        F.parse_url(F.col("to_url"), F.lit("HOST")).alias("dst_host"),
    )
    dg = domain_graph(host_edges)
    trusted = seed_plds(
        spark.createDataFrame([(u,) for u in corpus["seeds"]], "url string")
    )
    tr = trustrank(
        dg.select("src_pld", "dst_pld"),
        trusted,
        iterations=3,
        src="src_pld",
        dst="dst_pld",
    )
    # band PLD trust into two lanes at the approx median (bounded
    # driver scalar, same posture as opic_host_lanes' quantile cuts)
    thr = tr.agg(
        F.percentile_approx("trustrank", F.lit(0.5), 10_000)
    ).collect()[0][0]
    lanes = (
        sites.select("host")
        .withColumn(
            "pld",
            F.coalesce(_rd("host"), F.lower(F.col("host"))),
        )
        .join(tr.withColumnRenamed("node_id", "pld"), "pld", "left")
        .select(
            "host",
            F.when(F.coalesce(F.col("trustrank"), F.lit(0.0)) >= thr, 0)
            .otherwise(1)
            .alias("priority"),
        )
    )
    assert lanes.columns[:2] == ["host", "priority"]

    rerun = crawl(str(tmp_path / "trust"), priority_table=lanes)
    base_t = {r["url"]: r["page_type"] for r in base.results().collect()}
    rerun_t = {r["url"]: r["page_type"] for r in rerun.results().collect()}
    assert rerun_t == base_t


def test_null_trusted_ids_are_dropped_not_diluting(spark):
    from ieps_crawler_spark.operators.graph import spam_mass

    e = _edges(spark, [(1, 2), (2, 1)])
    t_clean = spark.createDataFrame([(1,)], "node_id long")
    t_null = spark.createDataFrame([(1,), (None,)], "node_id long")
    # trustrank: the NULL id must not dilute the 1/|T| teleport and
    # must not appear as a node
    tr_c = {r.node_id: r.trustrank for r in trustrank(e, t_clean, 3).collect()}
    tr_n = {r.node_id: r.trustrank for r in trustrank(e, t_null, 3).collect()}
    assert tr_c == tr_n and None not in tr_n
    # spam_mass: same contract, and value-identity with clean input
    sm_c = {r.node_id: r.spam_mass for r in spam_mass(e, t_clean, 3).collect()}
    sm_n = {r.node_id: r.spam_mass for r in spam_mass(e, t_null, 3).collect()}
    assert sm_c == sm_n and None not in sm_n


def test_seed_plds_keys_join_domain_graph_nodes(spark):
    from ieps_crawler_spark.operators.graph import seed_plds

    urls = spark.createDataFrame(
        [("http://www.a.gov.si/x",),   # -> a.gov.si
         ("http://intranet/y",),       # single label -> lower(host)
         ("schemeless.gov.si",),       # no scheme -> host unparseable
         (None,)],
        "url string",
    )
    got = {r.pld for r in seed_plds(urls).collect()}
    assert got == {"a.gov.si", "intranet"}
    # all-unparseable seed list -> EMPTY trust set (the tool guards
    # this case rather than emitting an all-spam report)
    empty = seed_plds(
        spark.createDataFrame([("no-scheme.si",)], "url string")
    )
    assert empty.isEmpty()


def test_empty_trusted_set_raises(spark):
    """ADVICE r3: an empty (or all-NULL) trust set must raise, not
    silently return all-zero trustrank / all-1.0 spam mass."""
    from ieps_crawler_spark.operators.graph import spam_mass

    e = _edges(spark, [(1, 2), (2, 3)])
    empty = spark.createDataFrame([], "node_id long")
    nulls = spark.createDataFrame([(None,), (None,)], "node_id long")
    for t in (empty, nulls):
        with pytest.raises(ValueError, match="trusted set is empty"):
            trustrank(e, t, 3)
        with pytest.raises(ValueError, match="trusted set is empty"):
            spam_mass(e, t, 3)


def test_precomputed_nodes_param_value_identical(spark):
    """Passing the endpoint-distinct via nodes= (the VERDICT r3 #7
    query-side fold) must not change a single rank value."""
    from ieps_crawler_spark.operators.graph import spam_mass

    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (4, 5), (9, 1)])
    t = spark.createDataFrame([(1,), (4,)], "node_id long")
    nodes = (
        e.select(F.col("from_id").alias("node_id"))
        .unionByName(e.select(F.col("to_id").alias("node_id")))
        .unionByName(t)
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = sorted(map(tuple, trustrank(e, t, 3).collect()))
    b = sorted(map(tuple, trustrank(e, t, 3, nodes=nodes).collect()))
    assert a == b
    c = sorted(map(tuple, spam_mass(e, t, 3).collect()))
    d = sorted(map(tuple, spam_mass(e, t, 3, nodes=nodes).collect()))
    assert c == d


def test_sampled_clustering_degenerates_to_exact(spark):
    """VERDICT r4 #6: with k >= max degree the neighborhood subsample
    IS the full neighborhood, so closed_pairs == triangles and
    coeff_est_permille == the exact tier's coeff_permille."""
    from ieps_crawler_spark.operators.graph import (
        clustering_coefficients,
        clustering_coefficients_sampled,
    )

    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (1, 4), (4, 2), (4, 5), (5, 6), (6, 4),
         (7, 1), (7, 2), (7, 3)],
    )
    exact = {
        r.node_id: (r.degree, r.triangles, r.coeff_permille)
        for r in clustering_coefficients(e).collect()
    }
    approx = {
        r.node_id: (r.degree, r.closed_pairs, r.coeff_est_permille)
        for r in clustering_coefficients_sampled(e, k=50).collect()
    }
    assert exact == approx


def test_sampled_clustering_caps_per_node_budget(spark):
    """A hub with degree >> k probes exactly C(k,2) pairs: sampled_nbrs
    == k, closed_pairs <= k*(k-1)/2, and the result is deterministic
    under repartitioning (hash-ranked sample, no partition order)."""
    from ieps_crawler_spark.operators.graph import (
        clustering_coefficients_sampled,
    )

    # star hub 0 with 40 leaves, leaves chained in a ring (many closed)
    pairs = [(0, i) for i in range(1, 41)] + [
        (i, i % 40 + 1) for i in range(1, 41)
    ]
    e = _edges(spark, pairs)
    k = 5
    rows = {
        r.node_id: r
        for r in clustering_coefficients_sampled(e, k=k).collect()
    }
    hub = rows[0]
    assert hub.degree == 40 and hub.sampled_nbrs == k
    assert 0 <= hub.closed_pairs <= k * (k - 1) // 2
    again = {
        r.node_id: tuple(r)
        for r in clustering_coefficients_sampled(
            e.repartition(13), k=k
        ).collect()
    }
    assert again == {n: tuple(r) for n, r in rows.items()}

    with pytest.raises(ValueError, match="k >= 2"):
        clustering_coefficients_sampled(e, k=1)


def test_nodes_param_missing_trusted_id_raises(spark):
    """ADVICE r4: a caller-supplied nodes= universe that misses a
    trusted id (the likely misuse — endpoint-distinct without the
    trust-set union) must raise, not silently misweight teleports."""
    from ieps_crawler_spark.operators.graph import spam_mass

    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    t = spark.createDataFrame([(1,), (42,)], "node_id long")  # 42 ∉ edges
    endpoints_only = (
        e.select(F.col("from_id").alias("node_id"))
        .unionByName(e.select(F.col("to_id").alias("node_id")))
        .distinct()
    )
    with pytest.raises(ValueError, match="missing trusted ids"):
        trustrank(e, t, 2, nodes=endpoints_only)
    with pytest.raises(ValueError, match="missing trusted ids"):
        spam_mass(e, t, 2, nodes=endpoints_only)
