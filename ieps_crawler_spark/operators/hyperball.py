"""HyperBall (Boldi & Vigna, 2013) — neighborhood functions, effective
diameter and harmonic centrality over the link graph via mergeable HLL
counters, at sizes where the per-node BFS behind exact distance
metrics is impossible.

The reference's report tabulates diameter for its crawled link graph
(report/report.tex:228-232) computed offline in Gephi; graph.py's
double-sweep BFS gives the exact-lower-bound twin. HyperBall is the
WEB-SCALE instrument for the same table: every node carries an HLL
sketch of its out-ball B(v, r) = {w : dist(v, w) <= r}; one relaxation
step merges each node's sketch with its successors' sketches, so after
r rounds the sketch estimates |B(v, r)|. From those estimates:
N(r) = Σ_v |B(v, r)| (the neighborhood function), the effective
diameter (smallest r with N(r) >= q·N(r_max)), and harmonic centrality
Σ_{w != v} 1/dist(v, w) accumulated as Σ_r (|B(v,r)| − |B(v,r−1)|)/r.

Representation & determinism: sketches are the engine's SPARSE integer
HLL register rows from operators/stats.py ((node_id, bucket, register),
md5-keyed, OR/merge = per-bucket max) — no floats anywhere in the
distributed path; per-(node, r) outputs are the exact-integer
``harm_num`` / ``n_zero_buckets`` plus the floor-divided ``ball_est``,
all hash-stable and replayed verbatim by the DuckDB oracle. The
derived ``ball_lc`` column and ``harmonic_centrality`` are FLOATS
(the ln small-range correction) — per repo convention they stay OUT
of hash-gated oracles; the integer columns are the exact contract.

Scale posture: one join (sketch rows onto edges by destination) + one
groupBy-max merge per round — register-row cardinality per node is
bounded by min(|ball|, m), so a round moves O(edges · m) rows worst
case with map-side combine on the merge; lineage is truncated per
round (the same fixed-small-iteration idiom as graph.pagerank); hub
in-degree skew rides the session's AQE skew-join setting. Boldi &
Vigna's bit-packed systolic variant is the single-machine analog; the
register-ROW formulation is what makes the merge a plain shuffle
aggregate Spark already knows how to scale.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .stats import (
    HLL_SMALL_RANGE_FACTOR,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def hyperball(
    edges: DataFrame,
    radius: int = 2,
    src: str = "from_id",
    dst: str = "to_id",
    bucket_hex: int = 2,
    rank_hex: int = 12,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Run ``radius`` HyperBall rounds over the directed graph. Returns
    (node_id, r, harm_num, n_zero_buckets, ball_est, ball_lc) for every
    node and every r in [0, radius] — ball_est estimates |B(node, r)|
    (r=0 rows estimate the singleton, a useful calibration anchor).
    Self-loops are ignored for relaxation but their endpoints stay in
    the node set (a self-loop never changes a ball; the node still HAS
    a singleton ball). ``checkpoint_rounds=False`` skips the per-round
    lineage truncation so plan audits can see the whole tree — leave it
    on for real runs."""
    if radius < 1:
        raise ValueError("hyperball needs radius >= 1")
    base = edges.select(
        F.col(src).cast("long").alias("s"),
        F.col(dst).cast("long").alias("d"),
    )
    nodes = (
        base.select(F.col("s").alias("node_id"))
        .union(base.select(F.col("d").alias("node_id")))
        .distinct()
    )
    e = base.filter(F.col("s") != F.col("d")).dropDuplicates(["s", "d"])
    # every round joins e and re-derives lineage through it — cache once
    # and release after the result is materialized (graph.pagerank idiom)
    e.cache()
    state = hll_registers(
        nodes, ["node_id"], "node_id", bucket_hex, rank_hex
    )
    est_kw = {"bucket_hex": bucket_hex, "rank_hex": rank_hex}

    m = 16 ** bucket_hex

    def snap(s: DataFrame, r: int) -> DataFrame:
        est = hll_estimate(s, ["node_id"], **est_kw)
        # standard HLL small-range correction (linear counting when the
        # raw estimate <= HLL_SMALL_RANGE_FACTOR*m and empty buckets
        # remain — same crossover as stats.hll_corrected) — typical
        # crawl-graph balls at small r ARE small, and the raw estimate
        # is zero-bucket-dominated there (every 1-element sketch reads
        # ~0.72m). ball_lc is a FLOAT (ln), so per repo convention it
        # stays out of hash-gated oracles; the integer columns remain
        # the exact contract.
        lc = F.lit(float(m)) * F.log(
            F.lit(float(m)) / F.col("n_zero_buckets").cast("double")
        )
        return est.select(
            "node_id",
            F.lit(r).alias("r"),
            "harm_num",
            "n_zero_buckets",
            F.col("hll_est").alias("ball_est"),
            F.when(
                (F.col("hll_est") <= HLL_SMALL_RANGE_FACTOR * m)
                & (F.col("n_zero_buckets") > 0),
                lc,
            )
            .otherwise(F.col("hll_est").cast("double"))
            .alias("ball_lc"),
        )

    try:
        out = snap(state, 0)
        for r in range(1, radius + 1):
            moved = e.join(state, e["d"] == state["node_id"]).select(
                F.col("s").alias("node_id"), "bucket", "register"
            )
            state = hll_merge(
                state.select("node_id", "bucket", "register")
                .unionByName(moved),
                ["node_id"],
            )
            if checkpoint_rounds:
                state = state.localCheckpoint(eager=False)
            out = out.unionByName(snap(state, r))
        if checkpoint_rounds:
            # materialize while e is cached; callers get a lineage-free
            # result and the edge cache is released
            out = out.localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return out


def neighborhood_function(hb: DataFrame) -> DataFrame:
    """N(r) = Σ_v |B(v, r)| estimates from a ``hyperball`` result:
    (r, n_reach_est) — the curve whose saturation point is the
    effective diameter. Sums the small-range-corrected ``ball_lc``
    (the raw estimate is flat on small balls, see ``hyperball``)."""
    return hb.groupBy("r").agg(F.sum("ball_lc").alias("n_reach_est"))


def effective_diameter(hb: DataFrame, q: float = 0.9) -> tuple[int, bool]:
    """Smallest r with N(r) >= q·N(radius) from a ``hyperball`` result,
    plus whether the curve had SATURATED over the last round — if it
    hadn't, the configured radius was too small and the value is only a
    lower bound. Saturation is judged on the PER-NODE POSITIVE growth
    Σ_v max(ball_lc(v, R) − ball_lc(v, R−1), 0), not the raw aggregate
    delta: the lc→raw correction-branch switch can dip individual
    estimates by a fraction, and on a still-expanding curve those dips
    could cancel real growth in the aggregate and fake convergence
    (the same clamp harmonic_centrality applies). Driver-side on
    radius+1 rows plus one bounded clamped-growth aggregate."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    rows = sorted(
        neighborhood_function(hb).collect(), key=lambda x: x["r"]
    )
    if not rows:
        raise ValueError("empty hyperball result")
    target = q * rows[-1]["n_reach_est"]
    eff = next(r["r"] for r in rows if r["n_reach_est"] >= target)
    saturated = False
    if len(rows) >= 2:
        r_max = rows[-1]["r"]
        w = Window.partitionBy("node_id").orderBy("r")
        growth = (
            hb.filter(F.col("r") >= r_max - 1)
            .withColumn("_prev", F.lag("ball_lc").over(w))
            .filter(F.col("r") == r_max)
            .agg(
                F.sum(
                    F.greatest(
                        F.col("ball_lc") - F.col("_prev"), F.lit(0.0)
                    )
                ).alias("g")
            )
            .collect()[0]["g"]
        )
        saturated = (growth or 0.0) < 1e-9 * max(
            rows[-1]["n_reach_est"], 1.0
        )
    return int(eff), bool(saturated)


def harmonic_centrality(hb: DataFrame) -> DataFrame:
    """Approximate harmonic centrality Σ_{w != v} 1/dist(v, w) from a
    ``hyperball`` result: hc(v) = Σ_{r>=1} (|B(v,r)| − |B(v,r−1)|)/r
    over the corrected estimates, rounded to 6. Deltas are clamped at 0
    — ``ball_lc`` is monotone within each correction branch (registers
    only grow), but the lc→raw branch switch can dip by a fraction at
    the 2.5m boundary. One lag window PARTITIONED BY NODE (radius+1
    rows each — never a global sort) + one hash aggregate."""
    w = Window.partitionBy("node_id").orderBy("r")
    deltas = hb.withColumn("_prev", F.lag("ball_lc").over(w)).filter(
        F.col("r") >= 1
    )
    return deltas.groupBy("node_id").agg(
        F.round(
            F.sum(
                F.greatest(F.col("ball_lc") - F.col("_prev"), F.lit(0.0))
                / F.col("r")
            ),
            6,
        ).alias("harmonic_centrality")
    )
