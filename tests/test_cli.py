"""End-to-end test of the reference-parity CLI entry point: a real
subprocess invocation (fresh JVM, fresh session) of
scripts/sql_dbms.py on the SampleTest corpus, asserting the printed
result and the typed-header CSV sink — the closest reproduction of how
a reference user actually runs a query."""

from __future__ import annotations

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
