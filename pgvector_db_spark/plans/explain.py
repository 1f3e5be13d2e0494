"""Physical-plan introspection helpers.

The 100 TB contract is enforceable only at the plan level: a filter that
doesn't reach the parquet scan, a dimension join that doesn't broadcast,
or a top-k that global-sorts are all silent at sf0.01 and fatal at scale.
These helpers make plan shape assertable in tests (tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears among the scan's PushedFilters."""
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    pushed = [
        seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]
    ]
    joined = " | ".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed; pushed: {joined}"


def assert_partition_filter(df: DataFrame, column: str) -> None:
    plan = physical_plan(df)
    assert "PartitionFilters: [" in plan, f"no partition filters:\n{plan}"
    seg = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert column in seg, f"{column} not in partition filters: {seg}"


def assert_broadcast_join(df: DataFrame, count: int = 1) -> None:
    plan = physical_plan(df)
    found = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert found >= count, f"expected >= {count} broadcast joins, found {found}:\n{plan}"


def assert_take_ordered(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, f"top-k compiled to a full sort:\n{plan}"
