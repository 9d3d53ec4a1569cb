"""Redirect-chain resolution over a (src_url, dst_url) redirect edge
table — the frontier-maintenance step behind a production fetch stage.

The reference never resolves redirects itself: its Selenium browser
follows them transparently and the worker just accepts any 2xx-3xx
final status (ref: actors/PageWorkerActor.scala:76-86, the
``200 <= status < 400`` gate). A headless-fetcher-free engine (our
sources/fetcher.py mapInPandas stage) instead sees raw 301/302
``Location`` hops as rows, and the frontier must collapse every chain
to its final URL before seen-dedup — otherwise each hop wastes a
politeness slot and the seen set fragments across aliases.

Algorithm: pointer doubling (path halving), the same shortcutting trick
as the engine's connected-components. Each round joins the current
mapping u→(w, h) with itself on w, composing two hops into one entry
with exact summed length — chains up to 2^r hops collapse in r rounds,
so ``max_hops`` needs only ceil(log2(max_hops))+1 shuffles, not
max_hops self-joins. Cycles (and chains longer than the budget) never
reach a terminal node; they surface as ``resolved = false`` — exactly
what a fetcher's "too many redirects" abort reports.

Scale posture: per round ONE self-join shuffle on the hop key plus an
eager localCheckpoint to keep the plan flat (lineage doubles per round
otherwise); the final terminal test is a left anti-ish join against
the distinct source set. Hop counts are exact bigints clamped at
max_hops+1 (cycle rows would otherwise double to 2^rounds); no floats,
no Python, no windows anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirect_chains(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve every redirecting URL to its final destination.

    ``edges`` holds one redirect hop per row. A URL with multiple
    recorded hops (re-crawled page whose redirect target changed) is
    determinized to its lexicographically smallest target — callers
    wanting latest-wins should pre-filter to one hop per source.

    Returns one row per distinct source URL:
    (src_col, final_url, n_hops, resolved) — ``resolved`` is true iff a
    terminal URL (one that redirects nowhere) is reached within
    ``max_hops`` hops; unresolved rows (cycles, over-budget chains)
    carry null final_url/n_hops, mirroring a fetcher's
    too-many-redirects abort.
    """
    if max_hops < 1:
        raise ValueError("resolve_redirect_chains needs max_hops >= 1")
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("w"))
        .filter(F.col("u").isNotNull() & F.col("w").isNotNull())
        .groupBy("u")
        .agg(F.min("w").alias("w"))
    )
    cap = max_hops + 1
    m = e.select("u", "w", F.lit(1).cast("long").alias("h"))
    m = m.localCheckpoint(eager=True)
    m0 = m  # checkpointed round-0 mapping; reused for the terminal test
    rounds = max(1, math.ceil(math.log2(cap)) + 1)
    for _ in range(rounds):
        nxt = m.select(
            F.col("u").alias("u2"),
            F.col("w").alias("w2"),
            F.col("h").alias("h2"),
        )
        m = (
            m.join(nxt, m["w"] == nxt["u2"], "left")
            .select(
                "u",
                F.coalesce("w2", "w").alias("w"),
                F.least(
                    F.col("h") + F.coalesce(F.col("h2"), F.lit(0)),
                    F.lit(cap).cast("long"),
                ).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    # terminal = never a source; a self-loop u -> u is its own source
    # forever, so it lands in resolved = false like any other cycle.
    # Source set comes from the CHECKPOINTED round-0 mapping (same
    # distinct-u set as e) — deriving it from e would re-scan and
    # re-aggregate the raw edge table one extra time at crawl scale.
    srcs = m0.select(F.col("u").alias("w")).withColumn("_is_src", F.lit(True))
    return m.join(srcs, "w", "left").select(
        F.col("u").alias(src_col),
        F.when(
            F.col("_is_src").isNull() & (F.col("h") <= max_hops), F.col("w")
        ).alias("final_url"),
        F.when(
            F.col("_is_src").isNull() & (F.col("h") <= max_hops), F.col("h")
        ).cast("long").alias("n_hops"),
        (F.col("_is_src").isNull() & (F.col("h") <= max_hops)).alias(
            "resolved"
        ),
    )
