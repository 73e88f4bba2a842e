from comlake_core_spark.plans.inspect import (
    executed_plan,
    count_shuffles,
    has_broadcast_join,
    has_pushed_filter,
    has_take_ordered,
    has_window_group_limit,
    codegen_stage_count,
)

__all__ = [
    "executed_plan",
    "count_shuffles",
    "has_broadcast_join",
    "has_pushed_filter",
    "has_take_ordered",
    "has_window_group_limit",
    "codegen_stage_count",
]
