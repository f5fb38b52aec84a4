"""Plan health audit for registered queries — the 100 TB checklist as
a CLI. For each query it inspects the FORMATTED physical plan (the
same artifact tests/test_plans.py asserts on) and reports:

- exchanges (shuffles) and their count
- join strategies (broadcast hash / shuffled hash / sort-merge /
  broadcast NLJ / cartesian — the last is flagged RED)
- unpartitioned window operators (single-partition scale killer, RED)
- row-at-a-time Python UDFs (BatchEvalPython, RED; ArrowEvalPython is
  the sanctioned batched path)
- PushedFilters reaching the scan when the plan filters at all

Usage:

    python scripts/plan_doctor.py [sf_dir] [query_name ...]

With no names, audits the whole registry (batch queries only —
streaming plans materialize on execution). Exit code 1 if any RED
finding appears, so it slots into CI.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_dbms_spark.plans import formatted_plan, unpartitioned_windows
from parallel_dbms_spark.queries import REGISTRY
from parallel_dbms_spark.session import get_spark

JOIN_KINDS = (
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def audit(plan: str, tags: tuple[str, ...]) -> tuple[list[str], list[str]]:
    """Returns (info lines, red findings)."""
    info, red = [], []
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    info.append(f"exchanges={n_exchange}")
    joins = {k: plan.count(k) for k in JOIN_KINDS if k in plan}
    if joins:
        info.append("joins=" + ",".join(f"{k}x{v}" for k, v in joins.items()))
    if "CartesianProduct" in joins:
        red.append("cartesian product")
    if unpartitioned_windows(plan):
        red.append("unpartitioned window (single-partition rank/agg)")
    if "BatchEvalPython" in plan and "pandas_udf" not in tags:
        red.append("row-at-a-time Python UDF in plan")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters: [" in ln]
    n_nonempty = sum(1 for ln in pushed if "PushedFilters: []" not in ln)
    if pushed:
        info.append(f"scans_with_pushdown={n_nonempty}/{len(pushed)}")
    return info, red


def main() -> None:
    sf_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    )
    names = sys.argv[2:] or [
        n for n, s in sorted(REGISTRY.items()) if "streaming" not in s.tags
    ]
    spark = get_spark(app_name="plan_doctor", cpus=8)
    any_red = False
    for name in names:
        spec = REGISTRY[name]
        try:
            plan = formatted_plan(spec.fn(spark, sf_dir))
        except Exception as e:  # a query that cannot even plan is RED
            print(f"RED  {name}: planning failed: {type(e).__name__}: {e}")
            any_red = True
            continue
        info, red = audit(plan, spec.tags)
        status = "RED " if red else "ok  "
        any_red = any_red or bool(red)
        detail = "; ".join(red + info)
        print(f"{status} {name}: {detail}", flush=True)
    sys.exit(1 if any_red else 0)


if __name__ == "__main__":
    main()
