"""Jaro-Winkler scorer: textbook values, DuckDB agreement, blocking
plan shape (no cartesian)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


KNOWN = [
    ("martha", "marhta", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.84),
    ("dixon", "dicksonx", 0.8133333333333332),
    # below the 0.7 boost threshold: prefix bonus must NOT apply
    ("abqqqqqqqq", "abzzz", 0.5333333333333333),
    ("same", "same", 1.0),
    ("", "x", 0.0),
    ("", "", 0.0),  # DuckDB convention: either empty -> 0
]


def test_jw_known_values_and_duckdb_agreement(spark):
    from parallel_dbms_spark.functions.dedup import jaro_winkler_sim

    jw = jaro_winkler_sim()
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in KNOWN], "a string, b string"
    ).select("a", "b", jw(F.col("a"), F.col("b")).alias("jw"))
    got = {(r["a"], r["b"]): r["jw"] for r in df.collect()}
    for a, b, want in KNOWN:
        assert got[(a, b)] == pytest.approx(want, abs=1e-12), (a, b)
        duck = duckdb.sql(
            f"SELECT jaro_winkler_similarity('{a}', '{b}')"
        ).fetchone()[0]
        assert got[(a, b)] == pytest.approx(duck, abs=1e-12), (a, b)


def test_jw_fuzzy_pairs_blocked_plan_and_symmetry(spark):
    from parallel_dbms_spark.functions.dedup import jw_fuzzy_pairs

    rows = [
        (1, "small ring", "B1"), (2, "small rings", "B1"),
        (3, "red widget", "B1"), (4, "small ring", "B2"),
        (5, "smal ring", "B2"), (6, "zzz", "B2"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    out = jw_fuzzy_pairs(df, "id", "name", "blk", threshold=0.9)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs          # same block, near-identical
    assert (4, 5) in pairs          # same block, typo
    assert (1, 4) not in pairs      # identical strings, DIFFERENT block
    assert all(a < b for a, b in pairs)
    # blocking must keep the join an equi-join, never a cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

def test_jw_composite_block_key_and_guard(spark):
    """Scale safety: a composite block key splits a dominant single-key
    block, and max_block_rows raises (instead of silently running
    O(n^2)) when a block exceeds the bound."""
    from parallel_dbms_spark.functions.dedup import jw_fuzzy_pairs

    # one dominant brand: 30 rows, two name-prefix groups of 15
    rows = [(i, ("alpha part %02d" % i) if i % 2 else ("omega part %02d" % i),
             "B1") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, name string, blk string")

    # single fixed key + guard below the block size -> hard error
    with pytest.raises(ValueError, match="max_block_rows"):
        jw_fuzzy_pairs(df, "id", "name", "blk", threshold=0.8,
                       max_block_rows=20)

    # composite key (brand + name 5-prefix) splits the block under the
    # same guard and still finds the in-prefix near-dups
    out = jw_fuzzy_pairs(
        df, "id", "name", ["blk", F.substring("name", 1, 5)],
        threshold=0.9, max_block_rows=20,
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs and all(a < b for a, b in pairs)
    # no cross-prefix pair survives (alpha ids are odd, omega even)
    assert all((a % 2) == (b % 2) for a, b in pairs)

    # guard disabled: the single-key call runs (small data)
    n = jw_fuzzy_pairs(df, "id", "name", "blk", threshold=0.9,
                       max_block_rows=None).count()
    assert n >= len(pairs)
