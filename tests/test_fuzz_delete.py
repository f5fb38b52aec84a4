"""Differential fuzz of the lake delete path: random tables + random
predicates, physical locate/rewrite/swap vs DuckDB's logical
anti-filter over the same starting rows. Catches 3VL slips, file-swap
row loss/duplication, and manifest drift that a single hand-picked
case would miss."""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from parallel_dbms_spark.sources.lake import delete_where_rewrite


def _gen_table(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.randrange(20),
                None if rng.random() < 0.15 else round(rng.uniform(0, 100), 2),
                rng.choice(["a", "b", "c", None]),
            )
        )
    return rows


def _gen_predicate(rng: random.Random):
    """(spark Column, duckdb WHERE text) pairs over k/score/tag."""
    choice = rng.randrange(5)
    if choice == 0:
        ks = sorted(rng.sample(range(20), rng.randrange(1, 5)))
        return F.col("k").isin(ks), f"k IN ({', '.join(map(str, ks))})"
    if choice == 1:
        lo = round(rng.uniform(0, 90), 2)
        return F.col("score") > lo, f"score > {lo}"
    if choice == 2:
        t = rng.choice(["a", "b", "c"])
        return F.col("tag") == t, f"tag = '{t}'"
    if choice == 3:
        lo = round(rng.uniform(0, 50), 2)
        k = rng.randrange(20)
        return (F.col("score") < lo) & (F.col("k") == k), (
            f"score < {lo} AND k = {k}"
        )
    return F.col("score").isNull(), "score IS NULL"


@pytest.mark.parametrize("seed", range(12))
def test_delete_where_matches_duckdb_anti_filter(spark, tmp_path, seed):
    rng = random.Random(1000 + seed)
    rows = _gen_table(rng, 800)
    df = spark.createDataFrame(
        rows, "id long, k int, score double, tag string"
    )
    t = str(tmp_path / f"t{seed}")
    df.repartition(rng.randrange(2, 7)).write.parquet(t)

    pred, where = _gen_predicate(rng)
    n_deleted, n_rewritten, n_total = delete_where_rewrite(spark, t, pred)

    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(
        rows, columns=["id", "k", "score", "tag"]
    ))
    want = sorted(
        con.sql(
            f"SELECT id FROM t WHERE NOT COALESCE(({where}), FALSE)"
        ).fetchall()
    )
    got = sorted(
        (r["id"],) for r in spark.read.parquet(t).select("id").collect()
    )
    assert got == want, f"seed={seed} where={where}"
    assert n_deleted == len(rows) - len(want)
    assert 0 <= n_rewritten <= n_total
