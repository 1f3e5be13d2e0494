from pgvector_db_spark.plans.explain import (
    assert_broadcast_join,
    assert_partition_filter,
    assert_pushed_filters,
    assert_take_ordered,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_partition_filter",
    "assert_pushed_filters",
    "assert_take_ordered",
    "physical_plan",
]
