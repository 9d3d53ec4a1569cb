"""OPIC — On-line Page Importance Computation (Abiteboul, Preda &
Cobena, WWW 2003) as an adaptive frontier-priority source.

The reference schedules purely FIFO-BFS with a bounded priority mailbox
(CrawlerBoundedPriorityMailbox.scala:14-21); its report's importance
analytics (PageRank in Gephi, report/report.tex:228-232) happen OFFLINE
after the crawl. OPIC is the classic way to make importance drive the
crawl itself *while it runs*: every page holds "cash"; fetching a page
distributes its cash equally over its out-links and banks the amount in
the page's "history"; a page's accumulated cash is its fetch priority
and history/total estimates importance — no convergence loop needed
mid-crawl. This module feeds the engine's existing ``priority_table``
lane (plans/wave.py) so the BFS-with-preference hook can be driven by
measured link structure instead of a static dim.

Determinism & oracle posture: all cash is exact integer MICRO-cash.
A page with cash ``c`` and ``d`` distinct out-links gives each link
``c // d``, and the remainder ``c % d`` goes to the link with the
LOWEST destination id — a deterministic tie-break the DuckDB oracle
replays with a row_number window. No floats anywhere, so results are
hash-stable across engines.

Dangling pages: the paper makes the graph strongly connected with a
VIRTUAL page linked to/from every real page; we synthesise it as node
``virtual_id`` (default -1, sorts lowest so remainders flow to it) and
drop it from results. Every real node therefore has out-degree
``real_out_degree + 1`` and no cash ever leaks: the total is conserved
every iteration (asserted in tests/test_opic.py).

Scale posture: per iteration two shuffles (broadcast-free join of the
cash table onto edges keyed by source + groupBy destination) — the same
cost envelope as one PageRank step; fixed small iteration counts; no
driver-side action inside the loop. The virtual-root edges are
generated, not materialised: the ``virtual_id`` row is a single
aggregate and its outflow re-enters as a per-node constant share, so
the synthetic star graph (2N edges) never hits the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000  # starting cash per page, in micro-cash units
VIRTUAL_ID = -1


def _nodes(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(F.col(src).alias("node_id"))
        .union(edges.select(F.col(dst).alias("node_id")))
        .distinct()
    )


def _distribute(
    cash: DataFrame,
    edges: DataFrame,
    src: str,
    dst: str,
    n_nodes: int,
    min_id: int,
    deg: DataFrame | None = None,
) -> DataFrame:
    """One simultaneous cash-distribution step over ``edges`` plus the
    implicit virtual-root star. ``cash`` is (node_id, cash_mu,
    history_mu) covering every real node AND the ``VIRTUAL_ID`` row.
    Returns the same schema: every node's cash fully distributed
    (banked into history), receipts summed onto each destination.

    The virtual root is handled analytically instead of via 2N
    synthetic edges: each real node's out-degree is ``d_real + 1`` (the
    +1 is its link to the root) and the remainder of the integer split
    goes to the LOWEST destination — the root (id -1) when present,
    which it always is, so real→real link k of a node with cash c and
    d_real out-links receives exactly ``c // (d_real + 1)`` and the
    root receives ``c // (d_real + 1) + c % (d_real + 1)``. A node with
    NO real out-links sends everything to the root. The root's own cash
    splits evenly over all N real nodes, remainder to the lowest
    node id (one row_number window over the node dim, not the edges).
    """
    real = cash.filter(F.col("node_id") != VIRTUAL_ID)
    root = cash.filter(F.col("node_id") == VIRTUAL_ID)

    if deg is None:
        # static across iterations — loop callers precompute and pass it
        deg = edges.groupBy(F.col(src).alias("node_id")).agg(
            F.count(F.lit(1)).alias("d_real")
        )
    giving = real.join(deg, "node_id", "left").withColumn(
        "d_real", F.coalesce(F.col("d_real"), F.lit(0))
    )
    # per-link share and the root's take — integer `div`, never a
    # double round-trip (doubles lose exactness past 2^53)
    giving = giving.withColumn(
        "share", F.expr("cash_mu div (d_real + 1)")
    ).withColumn(
        "to_root",
        F.col("cash_mu") - F.col("share") * F.col("d_real"),
    )

    inflow = (
        edges.join(
            giving.select(F.col("node_id").alias(src), "share"), src
        )
        .groupBy(F.col(dst).alias("node_id"))
        .agg(F.sum("share").alias("recv_mu"))
    )

    root_pot = (
        giving.agg(
            F.coalesce(F.sum("to_root"), F.lit(0)).cast("long").alias("pot")
        ).crossJoin(root.select(F.col("cash_mu").alias("root_cash")))
    )  # exactly 1 row: what the root holds AFTER this step's real->root flow
    # root's OWN cash (from the previous step) splits over the N real
    # nodes now: floor share each, remainder to the lowest node id —
    # ``min_id``, a scalar computed ONCE by the caller (the node set is
    # static), so no global window / single-task sort ever runs here.
    root_share = root_pot.select(
        F.expr(f"root_cash div {n_nodes}").alias("rshare"),
        (F.col("root_cash") % n_nodes).alias("rrem"),
        F.col("pot"),
    )
    out = (
        real.select("node_id", "cash_mu", "history_mu")
        .crossJoin(F.broadcast(root_share))
        .join(inflow, "node_id", "left")
        .select(
            "node_id",
            (
                F.coalesce(F.col("recv_mu"), F.lit(0))
                + F.col("rshare")
                + F.when(F.col("node_id") == min_id, F.col("rrem")).otherwise(0)
            ).alias("cash_mu"),
            # history banks the cash this node just distributed — its
            # PRE-step balance (the input frame's cash_mu, not the new
            # alias above; a select evaluates against its input)
            (F.col("history_mu") + F.col("cash_mu")).alias("history_mu"),
        )
    )
    new_root = root_share.select(
        F.lit(VIRTUAL_ID).cast("long").alias("node_id"),
        F.col("pot").alias("cash_mu"),
        F.lit(0).cast("long").alias("history_mu"),
    )
    return out.unionByName(new_root)


def opic_scores(
    edges: DataFrame,
    iterations: int = 2,
    src: str = "from_id",
    dst: str = "to_id",
) -> DataFrame:
    """Batch OPIC over a static link graph: every page starts with
    ``MICRO`` cash, ``iterations`` simultaneous distribute-all steps.
    Returns (node_id, cash_mu, history_mu) for real nodes — history is
    the importance estimate, cash the would-be fetch priority. Exact
    integers; total cash (incl. the virtual root) is conserved.
    """
    if iterations < 1:
        raise ValueError("opic_scores needs iterations >= 1")
    e = (
        edges.select(
            F.col(src).alias("s").cast("long"),
            F.col(dst).alias("d").cast("long"),
        )
        # self-loops are ignored (OPIC paper semantics: a page cannot
        # pay itself). NOTE: a node appearing ONLY in self-loops drops
        # out of the node set entirely (filtered before _nodes derives
        # it) and gets no score row — pinned in tests/test_opic.py.
        # hyperball.py makes the opposite choice (endpoints stay); OPIC
        # keys on link-graph participation, and a page with no real
        # in/out links has none.
        .filter(F.col("s") != F.col("d"))
        .dropDuplicates(["s", "d"])
    )
    # every iteration scans e twice (degree join + inflow join) and
    # re-derives lineage through it — cache once, release after the
    # result is materialized (hyperball/graph.pagerank idiom)
    e.cache()
    try:
        nodes = _nodes(e, "s", "d")
        cash = nodes.select(
            "node_id",
            F.lit(MICRO).cast("long").alias("cash_mu"),
            F.lit(0).cast("long").alias("history_mu"),
        ).unionByName(
            e.sparkSession.range(1).select(
                F.lit(VIRTUAL_ID).cast("long").alias("node_id"),
                F.lit(0).cast("long").alias("cash_mu"),
                F.lit(0).cast("long").alias("history_mu"),
            )
        )
        dims = nodes.agg(
            F.count(F.lit(1)).alias("n"), F.min("node_id").alias("m")
        ).collect()[0]  # two scalars, once, outside the loop
        if int(dims["n"] or 0) == 0:
            # empty graph (e.g. a wave that extracted zero non-self
            # links): nothing to score — return the empty result, not
            # a crash
            return cash.filter(F.col("node_id") != VIRTUAL_ID).limit(0)
        n_nodes, min_id = int(dims["n"]), int(dims["m"])
        if min_id <= VIRTUAL_ID:
            raise ValueError(
                f"node id {min_id} collides with or sorts below the "
                f"virtual root id {VIRTUAL_ID}; remap node ids to >= "
                f"{VIRTUAL_ID + 1} (e.g. pmod a signed hash) before "
                "calling opic_scores"
            )
        # out-degrees are static across iterations: materialize once
        # (eager checkpoint = one scan of the cached e, flat lineage)
        deg = (
            e.groupBy(F.col("s").alias("node_id"))
            .agg(F.count(F.lit(1)).alias("d_real"))
            .localCheckpoint(eager=True)
        )
        for _ in range(iterations):
            cash = _distribute(cash, e, "s", "d", n_nodes, min_id, deg=deg)
            # keep lineage flat across fixed small iteration counts,
            # same pattern as graph.pagerank
            cash = cash.localCheckpoint(eager=False)
        # materialize while e is cached; callers get a lineage-free
        # result and the edge cache is released
        return (
            cash.filter(F.col("node_id") != VIRTUAL_ID)
            .select("node_id", "cash_mu", "history_mu")
            .localCheckpoint(eager=True)
        )
    finally:
        e.unpersist()


def opic_update(
    cash: DataFrame,
    wave_links: DataFrame,
    fetched: DataFrame,
    src: str = "from_url",
    dst: str = "to_url",
    id_col: str = "url",
) -> DataFrame:
    """Incremental per-wave OPIC: only THIS wave's ``fetched`` pages
    distribute their cash, over the links extracted from them this wave
    (``wave_links``); everyone else's cash rides along. Newly discovered
    destinations enter the table with the cash they just received.
    No virtual root here — a fetched page with no out-links banks its
    cash into history and its cash leaves circulation (it will not be
    fetched again, so nothing downstream ever needed it; documented
    divergence from the batch variant, where conservation matters).

    ``cash``: (id_col, cash_mu, history_mu) — pass the previous wave's
    output (or seed rows at ``MICRO`` each). Keys are URL strings here,
    not node ids: this is the crawl-side state table.

    Scale posture: one join of the wave's fetched set (bounded by the
    politeness budget) onto the cash table + one groupBy destination —
    per-wave cost proportional to the WAVE, not the frontier. Output is
    a full replacement state table suitable for the engine's snapshot
    sinks.
    """
    links = (
        wave_links.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        # a page cannot pay itself: a fetched page whose only links are
        # self-links banks its cash like the no-out-links case
        .filter(F.col("_s") != F.col("_d"))
        .dropDuplicates(["_s", "_d"])
    )
    f = fetched.select(F.col(id_col).alias("_s")).distinct()
    links = links.join(f, "_s")  # only links out of this wave's fetches

    deg = links.groupBy("_s").agg(F.count(F.lit(1)).alias("_d_real"))
    givers = (
        cash.join(f, cash[id_col] == f["_s"], "left_semi")
        .join(deg, cash[id_col] == deg["_s"], "left")
        .select(
            F.col(id_col),
            "cash_mu",
            "history_mu",
            F.coalesce("_d_real", F.lit(0)).alias("_d_real"),
        )
    )
    shares = givers.withColumn(
        "_share",
        F.when(F.col("_d_real") > 0, F.expr("cash_mu div _d_real"))
        .otherwise(F.lit(0)),
    ).withColumn(
        "_rem",
        F.when(F.col("_d_real") > 0,
               F.col("cash_mu") % F.col("_d_real")).otherwise(F.lit(0)),
    )
    # remainder to the lexically-lowest destination of that source
    low_w = Window.partitionBy("_s").orderBy("_d")
    inflow = (
        links.join(
            shares.select(F.col(id_col).alias("_s"), "_share", "_rem"), "_s"
        )
        .withColumn("_rn", F.row_number().over(low_w))
        .select(
            F.col("_d").alias(id_col),
            (
                F.col("_share")
                + F.when(F.col("_rn") == 1, F.col("_rem")).otherwise(0)
            ).alias("_recv"),
        )
        .groupBy(id_col)
        .agg(F.sum("_recv").alias("_recv"))
    )
    base = cash.join(
        shares.select(id_col, F.col("cash_mu").alias("_gave")),
        id_col,
        "left",
    ).select(
        id_col,
        F.when(F.col("_gave").isNotNull(), F.lit(0).cast("long"))
        .otherwise(F.col("cash_mu"))
        .alias("cash_mu"),
        (
            F.col("history_mu")
            + F.coalesce(F.col("_gave"), F.lit(0))
        ).alias("history_mu"),
    )
    return (
        base.join(inflow, id_col, "full")
        .select(
            id_col,
            (
                F.coalesce(F.col("cash_mu"), F.lit(0))
                + F.coalesce(F.col("_recv"), F.lit(0))
            ).alias("cash_mu"),
            F.coalesce(F.col("history_mu"), F.lit(0)).alias("history_mu"),
        )
    )


def opic_host_lanes(
    cash: DataFrame,
    host_expr,
    n_lanes: int = 4,
    id_col: str = "url",
) -> DataFrame:
    """Bucket hosts into ``n_lanes`` priority lanes by total OPIC cash,
    shaped for the wave's ``priority_table`` hook ((host, priority),
    lower = fetched earlier under a capped wave). Lane 0 = the
    top-cash quantile band.

    Lanes come from QUANTILE THRESHOLDS (mergeable approx_percentile
    sketch + a CASE), not ntile: an unpartitioned ranking window would
    funnel every distinct host through ONE task — the exact single-task
    sort the host_rank lane query refuses ("no global sort/ntile") and
    a real bottleneck at web scale (O(10^8) hosts). Consequences vs
    ntile: hosts TIED on cash share a lane (fine for a scheduling
    hint), and at huge host counts the sketch can flip hosts within one
    quantile's error band near a boundary — by design, a lane is a
    coarse band, not a ranking.

    Scale posture: one map-side-combining aggregate over the cash
    table + one fixed-memory percentile sketch; the collected
    thresholds are ``n_lanes - 1`` scalars (bounded driver step).
    """
    if n_lanes < 1:
        raise ValueError("opic_host_lanes needs n_lanes >= 1")
    per_host = (
        cash.select(host_expr.alias("host"), "cash_mu")
        .groupBy("host")
        .agg(F.sum("cash_mu").alias("host_cash_mu"))
    )
    if n_lanes == 1:
        return per_host.select(
            "host", F.lit(0).alias("priority"), "host_cash_mu"
        )
    qs = [1.0 - i / n_lanes for i in range(1, n_lanes)]  # hi -> lo cuts
    cuts = per_host.agg(
        F.percentile_approx(
            "host_cash_mu", F.array(*[F.lit(q) for q in qs]), 10_000
        ).alias("c")
    ).collect()[0]["c"]
    if cuts is None:
        # empty cash table (wave 0, or an all-filtered wave): the
        # percentile sketch returns null — no hosts, no lanes; mirror
        # opic_scores' empty-graph contract instead of crashing
        return per_host.select(
            "host", F.lit(0).alias("priority"), "host_cash_mu"
        ).limit(0)
    lane = F.lit(n_lanes - 1)
    for i in reversed(range(n_lanes - 1)):  # lowest cut first
        lane = F.when(F.col("host_cash_mu") >= int(cuts[i]), i).otherwise(lane)
    return per_host.select("host", lane.alias("priority"), "host_cash_mu")
