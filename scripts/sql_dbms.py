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


def _split_statements(sql: str) -> list[str]:
    """Split a script on ';' outside single-quoted strings and
    backtick-quoted identifiers — the CLI accepts a whole session's
    statements in one invocation (one JVM), executed in order; the
    LAST result is the one spooled to CSV. A doubled quote inside a
    string (``'it''s'``) is the SQL escape, not a close-then-open, so
    a ';' after it stays inside the literal; a ';' inside a backticked
    identifier never splits either."""
    out, cur = [], []
    i, n = 0, len(sql)
    in_str = in_tick = False
    while i < n:
        ch = sql[i]
        if in_str:
            if ch == "'":
                if i + 1 < n and sql[i + 1] == "'":
                    cur.append("''")  # escaped quote: stay in-string
                    i += 2
                    continue
                in_str = False
            cur.append(ch)
        elif in_tick:
            if ch == "`":
                in_tick = False
            cur.append(ch)
        elif ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == "`":
            in_tick = True
            cur.append(ch)
        elif ch == ";":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    out.append("".join(cur))
    return out


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
    from parallel_dbms_spark.sources import (
        is_lake_statement,
        register_typed_csv_dir,
        tx_sql,
        write_typed_csv,
    )

    spark = get_spark(app_name="sql_dbms")
    statements = [st.strip() for st in _split_statements(sql) if st.strip()]
    csv_registered = False
    result = None
    for st in statements:
        if is_lake_statement(st):
            # lake DDL/DML (ALTER/OPTIMIZE/VACUUM/RESTORE/DESCRIBE/...):
            # table names resolve against <dir> as transactional-table
            # directories — the same single entry point the reference
            # has, extended to the lakehouse surface
            result = tx_sql(spark, st, base_dir=csv_dir)
        else:
            if not csv_registered:
                tables = register_typed_csv_dir(spark, csv_dir)
                csv_registered = True
                if tables:
                    print(
                        f"registered tables: {', '.join(sorted(tables))}"
                    )
            from parallel_dbms_spark.sources.tx_sql import (
                _register_lake_views,
            )

            result = spark.sql(_register_lake_views(spark, st, csv_dir))
        if explain:
            from parallel_dbms_spark.plans import formatted_plan

            print(formatted_plan(result))
        result.show(50, truncate=False)
    if result is None:
        print("no statement to run", file=sys.stderr)
        sys.exit(2)

    out_dir = os.path.join(os.getcwd(), "output")
    os.makedirs(out_dir, exist_ok=True)
    target = os.path.join(out_dir, "query_result.csv")
    write_typed_csv(result.coalesce(1), target)
    print(f"result written to {target}/ (typed-header CSV)")


if __name__ == "__main__":
    main()
