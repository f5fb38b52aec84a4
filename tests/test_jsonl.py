"""JSONL source/sink: roundtrip fidelity, corrupt-line quarantine, and
the landing-zone pass to parquet."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark.sources import (
    corrupt_records,
    jsonl_to_parquet,
    read_jsonl,
    write_jsonl,
)

DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def test_jsonl_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = corrupt_records(read_jsonl(spark, path, DOCS_DDL), keep=False)
    assert back.count() == docs.count()
    assert back.exceptAll(docs.select(*back.columns)).count() == 0
    assert dict(back.dtypes) == dict(docs.select(*back.columns).dtypes)


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "landing"
    p.mkdir()
    good = [{"doc_id": i, "text": f"t{i}", "lang": "en", "source": "s", "n_chars": 2}
            for i in range(5)]
    lines = [json.dumps(g) for g in good]
    lines.insert(2, "{not json at all")
    lines.insert(4, '["wrong", "shape"]')
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")

    df = read_jsonl(spark, str(p), DOCS_DDL)
    bad = corrupt_records(df, keep=True).collect()
    clean = corrupt_records(df, keep=False)
    assert clean.count() == 5
    assert len(bad) == 2
    assert "{not json at all" in {r._corrupt for r in bad}
    assert clean.agg(F.sum("doc_id")).collect()[0][0] == sum(range(5))


def test_jsonl_to_parquet_landing(spark, tmp_path):
    p = tmp_path / "landing2"
    p.mkdir()
    rows = [{"doc_id": i, "text": "x", "lang": "en", "source": f"s{i % 2}", "n_chars": 1}
            for i in range(10)]
    body = "\n".join(json.dumps(r) for r in rows) + "\nBROKEN\n"
    (p / "a.jsonl").write_text(body)
    dst = str(tmp_path / "parquet_out")
    quarantined = jsonl_to_parquet(spark, str(p), dst, DOCS_DDL, partition_by=["source"])
    assert quarantined.count() == 1
    back = spark.read.parquet(dst)
    assert back.count() == 10
    # hive partitioning materialized -> directory pruning available
    assert os.path.isdir(os.path.join(dst, "source=s0"))
