"""Physical-plan inspection: the scale-invariant checks.

Correctness says a query returns the right rows at sf0.01; these helpers say
whether the PLAN is the one that survives 100 TB — filters reaching the
parquet scan, small dims broadcast instead of shuffled, per-group top-k
pruned before the exchange, aggregates combined map-side. tests/test_plans.py
pins these properties for the headline workloads so a regression in plan
shape fails CI even while results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` text: per-node detail sections are NOT
    truncated, unlike `executedPlan().toString()` which elides long
    DataFilters/PushedFilters lists with '...'."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def scan_filters_on(df: DataFrame, column: str) -> bool:
    """True if a file scan evaluates a predicate on `column` at the scan
    (PushedFilters or DataFilters in the formatted plan) — i.e. the filter
    runs before any join/shuffle sees the rows."""
    for m in re.finditer(r"(?:PushedFilters|DataFilters): \[([^\]]*)\]", formatted_plan(df)):
        if column in m.group(1):
            return True
    return False


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True if the parquet scan received a pushed filter on `column`
    (PushedFilters: [...col...])."""
    plan = executed_plan(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if column in m.group(1):
            return True
    return False


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges. Every one is a full network+disk pass
    over its input at scale — the first number to check in any new plan."""
    return executed_plan(df).count("Exchange hashpartitioning") + executed_plan(df).count(
        "Exchange rangepartitioning"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    """orderBy+limit fused into TakeOrderedAndProject (per-partition heaps,
    O(k) result) rather than a global sort."""
    return "TakeOrderedAndProject" in executed_plan(df)


def has_window_group_limit(df: DataFrame) -> bool:
    """row_number ≤ k rewritten to WindowGroupLimit (partial top-k before
    the shuffle, Spark ≥3.5)."""
    return "WindowGroupLimit" in executed_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Two-phase hash aggregate (map-side combine before the exchange)."""
    plan = executed_plan(df)
    return len(re.findall(r"HashAggregate", plan)) >= 2 or "partial_" in plan


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better (more of
    the plan fused into generated JVM loops). Spans print as
    'WholeStageCodegen (N)' in formatted explain and as a '*(N)' operator
    prefix in compact plan text."""
    plan = executed_plan(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)) | set(re.findall(r"\*\((\d+)\)", plan)))
