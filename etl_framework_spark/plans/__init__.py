"""Plan inspection (SURVEY.md §3.3): make Catalyst's decisions
observable — predicate pushdown, column pruning, join strategy,
TakeOrderedAndProject — and snapshot them for regression diffing."""

from etl_framework_spark.plans.inspect import (
    explain_str,
    capture_plans,
    assert_in_plan,
    normalize_plan,
    golden_form,
    plan_skeleton,
    SKELETON_ONLY_KEYS,
)

__all__ = [
    "explain_str",
    "capture_plans",
    "assert_in_plan",
    "normalize_plan",
    "golden_form",
    "plan_skeleton",
    "SKELETON_ONLY_KEYS",
]
