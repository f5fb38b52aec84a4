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


def unpartitioned_windows(plan: str) -> list[str]:
    """Lines containing a window spec with NO partition columns — the
    single-partition scale killer (every row through one task).

    Rendering key (empirical, Spark 4): inside
    ``windowspecdefinition(...)`` the FIRST argument is the first
    partition column when partitioned, the first ORDER column
    (carrying ``ASC``/``DESC NULLS``) when only ordered, and the
    ``specifiedwindowframe(...)`` itself when the spec is empty — so
    the first argument tells the three shapes apart where bracket
    counting cannot.
    """
    def first_arg(s: str) -> str:
        # paren-aware scan to the first TOP-LEVEL comma, so expression
        # keys like coalesce(a, b) ASC stay one argument
        depth = 0
        for j, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    return s[:j]
                depth -= 1
            elif ch == "," and depth == 0:
                return s[:j]
        return s

    out = []
    for ln in plan.splitlines():
        pos, flagged = 0, False
        while not flagged:
            i = ln.find("windowspecdefinition(", pos)
            if i < 0:
                break
            first = first_arg(ln[i + len("windowspecdefinition(") :])
            if first.startswith("specifiedwindowframe") or (
                " ASC" in first or " DESC" in first
            ):
                flagged = True
            pos = i + 1
        if flagged:
            out.append(ln)
    return out


def assert_no_unpartitioned_window(df: DataFrame) -> None:
    plan = formatted_plan(df)
    bad = unpartitioned_windows(plan)
    assert not bad, f"unpartitioned window(s):\n" + "\n".join(bad)


def execution_metrics(df: DataFrame) -> dict:
    """Execute ``df`` to a noop sink and return the aggregated SQL
    metrics of its physical plan — the observability hook a perf
    harness needs beyond wall time: rows produced per operator class
    and bytes/files actually read by the scans (i.e. whether pruning
    REALLY happened, not just appeared in EXPLAIN).

    Returns {"scan_output_rows", "scan_files_read", "scan_bytes_read",
    "shuffle_bytes_written"} summed over the executed plan's nodes.
    Metric names are Spark-internal but stable across 3.x/4.x
    ("number of output rows", "number of files read", "size of files
    read", "shuffle bytes written").
    """
    # Execute THIS QueryExecution (a noop DataFrameWriter would plan a
    # fresh one, leaving these metric objects untouched at zero).
    qe = df._jdf.queryExecution()
    qe.toRdd().count()
    plan = qe.executedPlan()

    out = {
        "scan_output_rows": 0,
        "scan_files_read": 0,
        "scan_bytes_read": 0,
        "shuffle_bytes_written": 0,
    }

    def walk(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            # AQE wraps the real tree; metrics live on the final plan
            walk(node.finalPhysicalPlan())
            return
        if name in ("QueryStage", "ShuffleQueryStage", "BroadcastQueryStage", "ResultQueryStage"):
            walk(node.plan())
            return
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            metric_name = kv._2().name().toString()
            val = kv._2().value()
            if "Scan" in name:
                if metric_name == "Some(number of output rows)":
                    out["scan_output_rows"] += val
                elif metric_name == "Some(number of files read)":
                    out["scan_files_read"] += val
                elif metric_name == "Some(size of files read)":
                    out["scan_bytes_read"] += val
            if metric_name == "Some(shuffle bytes written)":
                out["shuffle_bytes_written"] += val
        it2 = node.children().iterator()
        while it2.hasNext():
            walk(it2.next())

    walk(plan)
    return out
