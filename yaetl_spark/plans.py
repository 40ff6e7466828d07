"""Physical-plan diagnostics — the 100 TB pre-flight check, as an API.

The test suite pins plan properties (broadcast joins, single shuffles,
scan-level filters) with string assertions over the executed plan; this
module exposes the same checks to users so a pipeline can refuse to launch
a plan that would melt a 1000-executor cluster. Pure driver-side plan
inspection — nothing here executes the query.

Typical gate before a big run::

    from yaetl_spark.plans import assert_scales, plan_summary
    assert_scales(df)            # raises on cartesian / nested-loop joins
    print(plan_summary(df))      # exchanges, joins, scans, pushed filters
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = [
    "PlanSummary",
    "assert_scales",
    "executed_plan",
    "is_final_plan",
    "plan_summary",
]


def executed_plan(df: DataFrame) -> str:
    """The executed (physical, post-AQE-prepare) plan as a string.

    AQE caveat: before the query RUNS, this is the *initial* adaptive
    plan — at runtime AQE may re-plan (sort-merge → broadcast join
    conversion, exchange reuse/elimination, skew-join splitting), so the
    string read pre-execution is a conservative upper bound on shuffles
    and join costs, which is exactly what a pre-flight gate wants
    (:func:`assert_scales` can only get *better* at runtime, never
    worse). To see what actually ran, call this (or
    :func:`plan_summary`) again on the SAME DataFrame AFTER an action:
    the AdaptiveSparkPlan node then prints ``isFinalPlan=true`` with the
    observed final plan.
    """
    return df._jdf.queryExecution().executedPlan().toString()


def is_final_plan(df: DataFrame) -> bool:
    """True when the plan string reflects the observed (post-execution,
    AQE-final) plan rather than the initial adaptive plan — i.e. the
    DataFrame has executed and ``AdaptiveSparkPlan isFinalPlan=true``.
    Also True for non-adaptive plans (nothing left to re-plan)."""
    plan = executed_plan(df)
    if "AdaptiveSparkPlan" not in plan:
        return True
    return "isFinalPlan=true" in plan


@dataclass
class PlanSummary:
    """Counts of the plan features that matter at scale."""

    exchanges_hash: int = 0
    exchanges_range: int = 0
    exchanges_single: int = 0
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    hash_aggregates: int = 0
    windows: int = 0
    python_evals: int = 0
    scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)

    @property
    def shuffles(self) -> int:
        return self.exchanges_hash + self.exchanges_range

    def __str__(self) -> str:  # compact one-line report
        parts = [
            f"shuffles={self.shuffles}"
            f" (hash={self.exchanges_hash}, range={self.exchanges_range},"
            f" single={self.exchanges_single})",
            f"joins: broadcast={self.broadcast_hash_joins}"
            f" sortmerge={self.sort_merge_joins}"
            f" nestedloop={self.nested_loop_joins}"
            f" cartesian={self.cartesian_products}",
            f"aggs={self.hash_aggregates} windows={self.windows}"
            f" python={self.python_evals} scans={self.scans}",
        ]
        if self.pushed_filters:
            parts.append(f"pushed={len(self.pushed_filters)} scan filter lists")
        return "; ".join(parts)


def plan_summary(df: DataFrame) -> PlanSummary:
    """Summarize the executed plan's scale-relevant features.

    Counts shuffles (hash/range/single-partition exchanges), join
    strategies, aggregate/window operators, Python evaluation nodes
    (Arrow/pickled UDF stages — the slow path), parquet scans, and the
    ``PushedFilters`` lists that made it into each scan.

    Pre-execution this summarizes the AQE *initial* plan (see
    :func:`executed_plan` — a conservative pre-flight view); call again
    after an action, checking :func:`is_final_plan`, for the observed
    runtime plan.
    """
    plan = executed_plan(df)
    return PlanSummary(
        exchanges_hash=plan.count("Exchange hashpartitioning"),
        exchanges_range=plan.count("Exchange rangepartitioning"),
        exchanges_single=plan.count("Exchange SinglePartition"),
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        cartesian_products=plan.count("CartesianProduct"),
        hash_aggregates=plan.count("HashAggregate"),
        windows=len(re.findall(r"\bWindow\b", plan)),
        python_evals=plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        scans=plan.count("FileScan"),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
    )


def assert_scales(
    df: DataFrame,
    allow_nested_loop: bool = False,
    max_shuffles: int | None = None,
    allow_python: bool = True,
) -> PlanSummary:
    """Raise ``ValueError`` when the plan has a shape that will not
    survive a large cluster: a cartesian product, an (optionally) a
    nested-loop join, more shuffles than ``max_shuffles``, or (with
    ``allow_python=False``) any Python evaluation stage in the plan.
    Returns the summary on success so callers can log it.

    Note: a one-row broadcast (e.g. joining a computed scalar) plans as
    BroadcastNestedLoopJoin — pass ``allow_nested_loop=True`` for plans
    that intentionally carry one.
    """
    s = plan_summary(df)
    problems = []
    if s.cartesian_products:
        problems.append(f"{s.cartesian_products} CartesianProduct node(s)")
    if s.nested_loop_joins and not allow_nested_loop:
        problems.append(
            f"{s.nested_loop_joins} BroadcastNestedLoopJoin node(s)"
        )
    if max_shuffles is not None and s.shuffles > max_shuffles:
        problems.append(f"{s.shuffles} shuffles (max {max_shuffles})")
    if not allow_python and s.python_evals:
        problems.append(f"{s.python_evals} Python evaluation stage(s)")
    if problems:
        raise ValueError(
            "plan fails scale gate: " + "; ".join(problems) + f" — {s}"
        )
    return s
