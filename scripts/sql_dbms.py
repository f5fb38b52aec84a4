"""Drop-in CLI for the reference's entry point.

Reference invocation (/root/reference/src/main.cpp:719-794, README):

    ./sql_dbms <csv_dir> "<SQL>" [use_gpu]

This invocation (use_gpu accepted and ignored — Catalyst/Tungsten pick
the physical strategy):

    python scripts/sql_dbms.py <csv_dir> "<SQL>" [anything] [--explain]

``--explain`` also prints the formatted physical plan — the analogue
of the reference printing its DuckDB physical tree before executing
(/root/reference/src/main.cpp:622-677): it shows PushedFilters,
ReadSchema pruning, join strategy, and exchange placement.

Behavior parity: every ``*.csv`` in <csv_dir> is registered as a table
named by file stem (typed ``Name (N|T|D) [(P)]`` headers); the SQL runs
(including the reference's comma-join dialect and its non-standard
``ORDER BY c Asc|Desc`` keywords, which Spark parses case-
insensitively); the result is printed and spooled to
``./output/query_result.csv`` with a typed header — the reference's
sink shape (/root/reference/src/headers/table.cpp:252-307).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = [a for a in sys.argv[1:] if a != "--explain"]
    explain = "--explain" in sys.argv[1:]
    if len(argv) < 2:
        print(
            'usage: python scripts/sql_dbms.py <csv_dir> "<SQL>" [use_gpu] [--explain]',
            file=sys.stderr,
        )
        sys.exit(2)
    csv_dir, sql = argv[0], argv[1]

    from parallel_dbms_spark.session import get_spark
    from parallel_dbms_spark.sources import register_typed_csv_dir, write_typed_csv

    spark = get_spark(app_name="sql_dbms")
    tables = register_typed_csv_dir(spark, csv_dir)
    if not tables:
        print(f"no *.csv tables found in {csv_dir}", file=sys.stderr)
        sys.exit(1)
    print(f"registered tables: {', '.join(sorted(tables))}")

    result = spark.sql(sql)
    if explain:
        from parallel_dbms_spark.plans import formatted_plan

        print(formatted_plan(result))
    result.show(50, truncate=False)

    out_dir = os.path.join(os.getcwd(), "output")
    os.makedirs(out_dir, exist_ok=True)
    target = os.path.join(out_dir, "query_result.csv")
    write_typed_csv(result.coalesce(1), target)
    print(f"result written to {target}/ (typed-header CSV)")


if __name__ == "__main__":
    main()
