"""The reference's typed-header CSV dialect (README.md:133-149):
header parsing, both timestamp formats, NULL handling (an upgrade over
the reference, which throws/skips), primary-key metadata, and a
write->read roundtrip."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from parallel_dbms_spark.sources import read_typed_csv, write_typed_csv
from parallel_dbms_spark.sources.typed_csv import parse_typed_header

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "SampleTest", "data")


def test_parse_typed_header():
    cols = parse_typed_header("Id (N) (P),Name (T),When (D)\n")
    assert cols == [("Id", "N", True), ("Name", "T", False), ("When", "D", False)]


def test_read_employees(spark):
    df = read_typed_csv(spark, os.path.join(FIX, "Employees.csv"))
    assert [f.name for f in df.schema.fields] == ["Employees_id", "Name", "Salary", "JoinedDate"]
    assert isinstance(df.schema["Salary"].dataType, T.DoubleType)
    assert isinstance(df.schema["JoinedDate"].dataType, T.TimestampType)
    assert df.schema["Employees_id"].metadata.get("primary_key") is True
    assert df.count() == 5


def test_read_both_timestamp_formats(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("Id (N),D1 (D)\n1,2021-01-02\n2,2021-01-02 03:04:05\n3,\n")
    df = read_typed_csv(spark, str(p))
    rows = {r.Id: r.D1 for r in df.collect()}
    assert rows[1.0].day == 2 and rows[1.0].hour == 0
    assert rows[2.0].hour == 3
    assert rows[3.0] is None  # NULL, not a crash (reference throws)


def test_roundtrip(spark, tmp_path):
    df = read_typed_csv(spark, os.path.join(FIX, "Products.csv"))
    out = str(tmp_path / "out")
    write_typed_csv(df.coalesce(1), out)
    back = read_typed_csv(spark, out + "/*.csv")
    orig = sorted(map(tuple, df.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == orig
