"""The reference's golden acceptance suite, ported verbatim
(/root/reference/src/SampleTest.zip — typed-header CSVs + 3 queries +
expected result CSVs; SURVEY §5.1). query1 joins via comma syntax and
aggregates (expected AVG 75667.05), query2 filters on a timestamp and
sorts with the reference's non-standard ``Asc`` keyword, query3 is a
correlated scalar subquery sorted ``Desc``."""

from __future__ import annotations

import csv
import os

import pytest

from parallel_dbms_spark.sources import register_typed_csv_dir

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "SampleTest")


def _golden(n):
    with open(os.path.join(FIX, f"result{n}.csv")) as fh:
        rows = list(csv.reader(fh))
    return rows[0], rows[1:]


def _run(spark, n):
    register_typed_csv_dir(spark, os.path.join(FIX, "data"))
    with open(os.path.join(FIX, f"query{n}.txt")) as fh:
        sql = fh.read()
    return spark.sql(sql)


def test_query1_join_avg(spark):
    df = _run(spark, 1)
    header, rows = _golden(1)
    assert df.columns == header  # AverageSalary
    got = df.collect()
    assert len(got) == 1
    assert got[0][0] == pytest.approx(float(rows[0][0]), abs=0.005)


def test_query2_filter_sort(spark):
    df = _run(spark, 2)
    header, rows = _golden(2)
    assert df.columns == header  # ProductName, Price
    got = [(r[0], float(r[1])) for r in df.collect()]
    want = [(name, float(price)) for name, price in rows]
    assert got == want  # ordered compare: ORDER BY Asc is part of the contract


def test_query3_correlated_subquery(spark):
    df = _run(spark, 3)
    header, rows = _golden(3)
    assert df.columns == header  # Name, TotalSales
    got = [(r[0], round(float(r[1]), 2)) for r in df.collect()]
    want = [(name, round(float(total), 2)) for name, total in rows]
    assert got == want  # ordered: Desc
