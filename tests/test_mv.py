"""Materialized-view define + rewrite (operators/mv.py): the rewrite
must equal a full recompute exactly, and containment violations must
raise, never silently recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark.operators.mv import define_mv, mv_answer


@pytest.fixture()
def mv_path(spark, tmp_path):
    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100).cast("long")
    ).withColumn("mon", F.date_trunc("month", "o_orderdate"))
    p = str(tmp_path / "mv")
    define_mv(
        o, p,
        group_cols=["o_orderpriority", "mon"],
        measures={
            "sum_cents": ("sum", "cents"),
            "n": ("count", "cents"),
            "min_cents": ("min", "cents"),
            "max_cents": ("max", "cents"),
        },
    )
    return p


def test_rewrite_equals_full_recompute(spark, mv_path):
    got = {
        r.o_orderpriority: (r.total, r.n, r.lo, r.hi, r.avg)
        for r in mv_answer(
            spark, mv_path, ["o_orderpriority"],
            {"total": ("sum", "cents"), "n": ("count", "cents"),
             "lo": ("min", "cents"), "hi": ("max", "cents"),
             "avg": ("avg", "cents")},
        ).collect()
    }
    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100).cast("long")
    )
    want = {
        r.o_orderpriority: (r.total, r.n, r.lo, r.hi, r.avg)
        for r in o.groupBy("o_orderpriority").agg(
            F.sum("cents").alias("total"), F.count("cents").alias("n"),
            F.min("cents").alias("lo"), F.max("cents").alias("hi"),
            (F.sum("cents").cast("double") / F.count("cents").cast("double")).alias("avg"),
        ).collect()
    }
    assert got == want  # exact, including the derived avg


def test_rewrite_at_view_granularity_is_identity(spark, mv_path):
    fine = mv_answer(
        spark, mv_path, ["o_orderpriority", "mon"], {"n": ("count", "cents")}
    )
    assert fine.agg(F.sum("n")).head()[0] == load_table(
        spark, SF_SMOKE, "orders"
    ).count()


def test_containment_violations_raise(spark, mv_path):
    with pytest.raises(ValueError, match="too coarse"):
        mv_answer(spark, mv_path, ["o_custkey"], {"n": ("count", "cents")})
    with pytest.raises(ValueError, match="not derivable"):
        mv_answer(spark, mv_path, ["o_orderpriority"], {"x": ("sum", "o_totalprice")})
    with pytest.raises(ValueError, match="needs stored sum"):
        mv_answer(spark, mv_path, ["o_orderpriority"], {"x": ("avg", "other")})


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    from parallel_dbms_spark.operators.mv import define_mv, mv_answer, mv_refresh

    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100).cast("long")
    )
    hist = o.filter(F.col("o_orderkey") % 3 != 0)
    delta = o.filter(F.col("o_orderkey") % 3 == 0)
    meas = {
        "sum_cents": ("sum", "cents"), "n": ("count", "cents"),
        "min_cents": ("min", "cents"), "max_cents": ("max", "cents"),
    }
    p_inc, p_full = str(tmp_path / "inc"), str(tmp_path / "full")
    define_mv(hist, p_inc, ["o_orderpriority"], meas)
    mv_refresh(spark, p_inc, delta)
    define_mv(o, p_full, ["o_orderpriority"], meas)

    want = {"total": ("sum", "cents"), "n": ("count", "cents"),
            "lo": ("min", "cents"), "hi": ("max", "cents"),
            "avg": ("avg", "cents")}
    inc = sorted(tuple(r) for r in
                 mv_answer(spark, p_inc, ["o_orderpriority"], want).collect())
    full = sorted(tuple(r) for r in
                  mv_answer(spark, p_full, ["o_orderpriority"], want).collect())
    assert inc == full  # refresh ≡ rebuild, exactly


def test_refresh_with_new_groups_appends_them(spark, tmp_path):
    from pyspark.sql import Row

    from parallel_dbms_spark.operators.mv import define_mv, mv_answer, mv_refresh

    base = spark.createDataFrame([Row(g="a", v=1), Row(g="a", v=2)])
    delta = spark.createDataFrame([Row(g="b", v=10)])
    p = str(tmp_path / "mvg")
    define_mv(base, p, ["g"], {"s": ("sum", "v"), "n": ("count", "v")})
    mv_refresh(spark, p, delta)
    got = {r.g: (r.s, r.n) for r in mv_answer(
        spark, p, ["g"], {"s": ("sum", "v"), "n": ("count", "v")}
    ).collect()}
    assert got == {"a": (3, 2), "b": (10, 1)}
