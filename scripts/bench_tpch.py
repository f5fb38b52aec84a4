"""TPC-H-shape suite timing: all 22 query shapes from the registry at
$SPARK_GRAFT_SF_DIR (default sf0.1), noop sink, best-of-2 per query.

Prints ONE JSON line:
  {"metric": "tpch_suite_wall", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ..., "q22": sec}, "sf": ...}

The shapes are registered as tpch_q{N}_shape (q1 = agg_grouped_q1) and
each is value-hash-verified against DuckDB by the correctness gate —
this script measures them, it does not re-verify.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_dbms_spark.queries import REGISTRY
from parallel_dbms_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or (os.cpu_count() or 8)
    spark = get_spark(app_name="bench_tpch", cpus=cpus)
    names = {1: "agg_grouped_q1"}
    for n in range(2, 23):
        names[n] = f"tpch_q{n}_shape"
    missing = [v for v in names.values() if v not in REGISTRY]
    if missing:
        sys.exit(f"missing registry entries: {missing}")

    # warm-up: JVM + file listing
    REGISTRY[names[6]].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    times = {}
    for n in sorted(names):
        fn = REGISTRY[names[n]].fn
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[f"q{n}"] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "tpch_suite_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
