from .explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_no_unpartitioned_window,
    assert_pushed_filters,
    assert_read_schema_pruned,
    execution_metrics,
    formatted_plan,
    unpartitioned_windows,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_no_unpartitioned_window",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "execution_metrics",
    "formatted_plan",
    "unpartitioned_windows",
]
