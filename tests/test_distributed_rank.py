"""global_row_number / ntile_distributed must equal the single-
partition global-window forms exactly — same numbers, computed with
range partitioning + broadcast offsets instead of one giant task.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from conftest import SF_SMOKE

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark.operators import global_row_number, ntile_distributed

def _order():
    return [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]


def _orders(spark):
    return load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )


def test_global_row_number_matches_global_window(spark):
    o = _orders(spark)
    got = global_row_number(o, _order(), num_partitions=7, row_col="rn")
    w = Window.orderBy(*_order())
    want = o.withColumn("rn", F.row_number().over(w).cast("bigint"))
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_ntile_matches_global_window_ntile(spark):
    o = _orders(spark)
    got = ntile_distributed(o, _order(), n_buckets=10, num_partitions=7)
    w = Window.orderBy(*_order())
    want = o.withColumn("bucket", F.ntile(10).over(w))
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_ntile_fewer_rows_than_buckets(spark):
    # n < buckets: every row is its own bucket 1..n, standard semantics
    o = _orders(spark).orderBy("o_orderkey").limit(4)
    got = ntile_distributed(o, _order(), n_buckets=10, num_partitions=3)
    w = Window.orderBy(*_order())
    want = o.withColumn("bucket", F.ntile(10).over(w))
    assert sorted(r["bucket"] for r in got.collect()) == [1, 2, 3, 4]
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_row_numbers_are_a_permutation(spark):
    o = _orders(spark)
    n = o.count()
    got = global_row_number(o, _order(), num_partitions=5)
    stats = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("rn").alias("nd"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
    ).first()
    assert (stats["n"], stats["nd"], stats["lo"], stats["hi"]) == (n, n, 1, n)


def test_empty_input_yields_empty_output(spark):
    o = _orders(spark).filter("o_orderkey < 0")
    assert global_row_number(o, _order(), num_partitions=4).count() == 0
    assert ntile_distributed(o, _order(), n_buckets=10).count() == 0


def test_rank_small_result_matches_window_ranking(spark):
    from parallel_dbms_spark.operators.relational import rank_small_result

    o = _orders(spark).orderBy(F.col("o_totalprice").desc()).limit(50)
    got = rank_small_result(o, "o_totalprice", "o_orderkey", rank_col="rk")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    want = o.select(
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("integer").alias("rk"),
    )
    assert got.select("o_orderkey", "o_totalprice", "rk").exceptAll(want).isEmpty()
    assert want.exceptAll(got.select("o_orderkey", "o_totalprice", "rk")).isEmpty()


def test_ntile_chained_applications_stay_consistent(spark):
    """Regression: feeding one ntile_distributed output into another
    (RFM-style chained quartiles) used to silently corrupt the FIRST
    bucket column — spark_partition_id() re-executed divergently for
    the two consumers of the range exchange under the downstream
    re-shuffle, yielding impossible buckets (n+1) and uneven sizes.
    The partition assignment is now pinned with an eager
    localCheckpoint; every chained column must show exact NTILE
    bucket sizes."""
    from pyspark.sql import functions as F

    from parallel_dbms_spark.operators import ntile_distributed

    n = 20011  # prime: uneven tail exercises the q/q+1 split
    df = spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761) % 100000).alias("a"),
        ((F.col("id") * 40503) % 99991).alias("b"),
        ((F.col("id") * 69069) % 77777).alias("c"),
    )
    s = ntile_distributed(df, ["a", "k"], 4, out_col="qa")
    s = ntile_distributed(s, ["b", "k"], 4, out_col="qb")
    s = ntile_distributed(s, ["c", "k"], 4, out_col="qc")
    out = s.collect()
    assert len(out) == n
    import collections

    q, r = divmod(n, 4)
    want = sorted([q + 1] * r + [q] * (4 - r))
    for col in ("qa", "qb", "qc"):
        hist = collections.Counter(row[col] for row in out)
        assert set(hist) == {1, 2, 3, 4}, (col, hist)
        assert sorted(hist.values()) == want, (col, hist)
