"""End-to-end test of the reference-parity CLI entry point: a real
subprocess invocation (fresh JVM, fresh session) of
scripts/sql_dbms.py on the SampleTest corpus, asserting the printed
result and the typed-header CSV sink — the closest reproduction of how
a reference user actually runs a query."""

from __future__ import annotations
import pytest

import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "tests", "fixtures", "SampleTest")


def test_cli_runs_golden_query1_end_to_end(tmp_path):
    sql = open(os.path.join(FIX, "query1.txt")).read().strip().rstrip(";")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "sql_dbms.py"),
         os.path.join(FIX, "data"), sql, "use_gpu"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "75667.05" in proc.stdout
    # typed-header CSV sink in ./output, reference's sink shape
    parts = glob.glob(str(tmp_path / "output" / "query_result.csv" / "*.csv"))
    assert parts, proc.stdout
    content = open(parts[0]).read().splitlines()
    assert content[0].startswith("AverageSalary (N)")
    assert content[1].startswith("75667.05")


def test_cli_explain_prints_physical_plan(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "sql_dbms.py"),
         os.path.join(FIX, "data"),
         "SELECT Name FROM Employees WHERE Salary > 1000", "--explain"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Physical Plan" in proc.stdout
    assert "PushedFilters" in proc.stdout  # filter reached the scan


@pytest.mark.slow  # residual: test_cli_runs_golden_query1_end_to_end + test_cli_explain keep the subprocess CLI surface
def test_cli_lake_sql_roundtrip_rename_append_prune(tmp_path):
    """The lake lifecycle purely through the SQL door, one CLI
    invocation (one JVM): create a partitioned-by-proxy table, rename
    a column (metadata-only), append under the NEW name, prune with a
    filter, and DESCRIBE DETAIL — the reference's single entry point
    (src/main.cpp:719-794) extended to the lakehouse surface."""
    script = "; ".join([
        "CREATE TABLE t (k BIGINT, x BIGINT, v STRING) CLUSTER BY (x)",
        "INSERT INTO t VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c')",
        "ALTER TABLE t ADD CONSTRAINT xpos CHECK (x >= 0)",
        "ALTER TABLE t RENAME COLUMN x TO meters",
        "INSERT INTO t (k, meters, v) VALUES (4, 40, 'd')",
        "OPTIMIZE t",
        "DESCRIBE DETAIL t",
        "SELECT k, meters FROM t WHERE meters >= 20 ORDER BY k",
    ])
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "sql_dbms.py"),
         str(tmp_path / "lake"), script],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    for op in ("create_table", "insert", "add_constraint",
               "rename_column", "optimize"):
        assert op in out, f"{op} missing from CLI output\n{out[-2000:]}"
    # the final SELECT served the renamed column and the filter
    assert "meters" in out
    for row in ("|2  |20", "|3  |30", "|4  |40"):
        assert row in out, out[-2000:]
    assert "|1  |10" not in out
    # the last result spooled as typed-header CSV (reference sink shape)
    parts = glob.glob(str(tmp_path / "output" / "query_result.csv" / "*.csv"))
    assert parts
    lines = open(parts[0]).read().splitlines()
    assert lines[0].split(",")[0].startswith("k (")
    assert [ln.split(",")[0] for ln in lines[1:4]] == ["2", "3", "4"]


def test_split_statements_respects_quotes():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sql_dbms", os.path.join(REPO, "scripts", "sql_dbms.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod._split_statements(
        "INSERT INTO t VALUES (1, 'a;b'); SELECT ';' ; DELETE FROM t"
    )
    assert [s.strip() for s in out if s.strip()] == [
        "INSERT INTO t VALUES (1, 'a;b')",
        "SELECT ';'",
        "DELETE FROM t",
    ]


def test_split_statements_escaped_quotes_and_backticks():
    """SQL's doubled-quote escape ('it''s') must not flip the in-string
    state (a later ';' inside the literal would split mid-statement),
    and a backtick-quoted identifier containing ';' never splits."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sql_dbms", os.path.join(REPO, "scripts", "sql_dbms.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod._split_statements(
        "UPDATE t SET v = 'it''s; tricky' WHERE k = 1; "
        "SELECT `odd;name` FROM t; SELECT ''"
    )
    assert [s.strip() for s in out if s.strip()] == [
        "UPDATE t SET v = 'it''s; tricky' WHERE k = 1",
        "SELECT `odd;name` FROM t",
        "SELECT ''",
    ]
