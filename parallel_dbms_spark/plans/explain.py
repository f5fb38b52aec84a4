"""Plan-inspection helpers: make "did the filter push down / did the
join broadcast / did the scan prune columns" assertable in tests.

The reference implements pushdown by hand in its scan
(/root/reference/src/main.cpp:64-200); here Catalyst does it, and these
helpers verify the physical plan actually shows PushedFilters /
ReadSchema pruning / BroadcastHashJoin — the 100 TB health checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters list of the scan."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed; plan:\n{plan}"


def assert_read_schema_pruned(df: DataFrame, max_cols: int) -> None:
    """Assert the parquet ReadSchema carries at most ``max_cols`` columns."""
    plan = formatted_plan(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln and "struct<" in ln:
            struct = ln.split("struct<", 1)[1]
            ncols = struct.count(":")  # one : per struct field
            assert ncols <= max_cols, f"scan reads {ncols} cols (> {max_cols}):\n{ln}"
            return
    raise AssertionError(f"no ReadSchema in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"
