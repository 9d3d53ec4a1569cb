"""Plan-shape audit — the repo's internal guardrail discipline
(tests/test_plans.py) exposed as a public API, so users can assert the
same scale-safety invariants over THEIR queries before launching them
at a 1000-executor cluster.

The checks are textual over the executed plan, deliberately: they
catch the plan Spark actually chose (after AQE re-planning the shape
strings remain in the physical plan tree), and they are the exact
checks this repo's own CI runs against every driver query.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame

# plan fragments that almost never belong in a 100 TB job
DEFAULT_FORBIDDEN = (
    # row-at-a-time / batched Python execution in the hot path
    "EvalPython",
    # unkeyed pair blow-ups
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
)

__all__ = ["plan_text", "plan_counts", "assert_scale_safe", "PlanViolation"]


class PlanViolation(AssertionError):
    """Raised when a plan contains a forbidden operator shape."""


def plan_text(df: DataFrame) -> str:
    """The executed physical plan as text (what .explain() prints)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_counts(df: DataFrame) -> dict[str, int]:
    """Operator-shape census of a plan: exchanges (shuffles/broadcasts),
    Python stages, join flavors, codegen spans — the numbers to eyeball
    before asking 'would this survive a 100× scale-up?'."""
    p = plan_text(df)
    return {
        "shuffle_exchanges": p.count("Exchange hashpartitioning")
        + p.count("Exchange rangepartitioning")
        + p.count("Exchange RoundRobinPartitioning"),
        "broadcast_exchanges": p.count("BroadcastExchange"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "nested_loop_joins": p.count("BroadcastNestedLoopJoin")
        + p.count("CartesianProduct"),
        "python_stages": p.count("EvalPython")
        + p.count("MapInPandas")
        + p.count("FlatMapGroupsInPandas")
        + p.count("ArrowEvalPython"),
        "wholestage_codegen_spans": p.count("WholeStageCodegen"),
        # a Sort node prints its global flag after the ordering list:
        # 'Sort [...], true, 0' = global (range-partitioned total order),
        # ', false' = local (SMJ side sorts, window/agg partition sorts).
        # Counting the flag directly — subtracting SortMergeJoin count
        # under-corrected (an SMJ inserts up to TWO local Sorts) and
        # miscounted window sorts as global. Greedy .* to the LAST
        # '], true' on the line: ordering expressions can themselves
        # contain ']' (array element access like x#1[0]), which a
        # [^\]]* class would stop at and miss the node.
        "global_sorts": len(
            _re.findall(r"Sort \[.*\], true", p)
        ),
    }


def assert_scale_safe(
    df: DataFrame,
    forbid: tuple[str, ...] = DEFAULT_FORBIDDEN,
    allow: tuple[str, ...] = (),
) -> dict[str, int]:
    """Assert the plan contains none of the forbidden shapes; returns
    the plan_counts census on success so callers can additionally bound
    shuffle counts. ``allow`` whitelists fragments a specific query
    legitimately needs (e.g. 'MapInPandas' for an Arrow extraction
    stage)."""
    p = plan_text(df)
    hits = [f for f in forbid if f not in allow and f in p]
    if hits:
        raise PlanViolation(
            f"plan contains forbidden operator(s) {hits}:\n{p}"
        )
    return plan_counts(df)
