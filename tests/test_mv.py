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


# ------------------------------------------- txlog-driven IVM (deletes)


def _sync_setup(spark, tmp_path, measures):
    from parallel_dbms_spark.operators.mv import mv_sync_txlog  # noqa
    from parallel_dbms_spark.sources import txlog

    base = str(tmp_path)
    t, p = base + "/t", base + "/mv"
    d1 = spark.createDataFrame(
        [(i, f"g{i % 5}", i * 10) for i in range(500)],
        "k long, g string, v long",
    )
    txlog.tx_append(d1, t)
    define_mv(
        txlog.read_snapshot(spark, t), p, ["g"],
        {"n": ("count", "v"), "s": ("sum", "v"),
         "mn": ("min", "v"), "mx": ("max", "v")},
        synced_version=txlog.log_versions(t)[-1],
    )
    return t, p


def _recompute(spark, t):
    from parallel_dbms_spark.sources import txlog

    return {
        r.g: (r.n, r.s, r.mn, r.mx)
        for r in txlog.read_snapshot(spark, t).groupBy("g").agg(
            F.count("v").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }


def test_sync_folds_inserts_and_deletes(spark, tmp_path):
    from parallel_dbms_spark.operators.mv import mv_sync_txlog
    from parallel_dbms_spark.sources import txlog

    t, p = _sync_setup(spark, tmp_path, None)
    txlog.tx_append(
        spark.createDataFrame(
            [(i, f"g{i % 7}", i * 10) for i in range(500, 700)],
            "k long, g string, v long",
        ),
        t,
    )
    # deletes that hit group maxima (forces the min/max group
    # recompute path) and a merge-on-read delete
    txlog.tx_delete_where(spark, t, "v >= 4500")
    txlog.tx_delete_where_mor(spark, t, "k < 3")
    v = mv_sync_txlog(spark, p, t)
    assert v == txlog.log_versions(t)[-1]
    got = {
        r.g: (r.n, r.s, r.mn, r.mx)
        for r in spark.read.parquet(p).collect()
    }
    assert got == _recompute(spark, t)


def test_sync_drops_emptied_groups_and_is_idempotent(spark, tmp_path):
    from parallel_dbms_spark.operators.mv import mv_sync_txlog
    from parallel_dbms_spark.sources import txlog

    t, p = _sync_setup(spark, tmp_path, None)
    txlog.tx_delete_where(spark, t, "g = 'g2'")
    v = mv_sync_txlog(spark, p, t)
    groups = {r.g for r in spark.read.parquet(p).collect()}
    assert groups == {"g0", "g1", "g3", "g4"}
    # no new commits -> no-op, same version
    assert mv_sync_txlog(spark, p, t) == v
    assert _recompute(spark, t) == {
        r.g: (r.n, r.s, r.mn, r.mx)
        for r in spark.read.parquet(p).collect()
    }


def test_sync_requires_a_count_measure(spark, tmp_path):
    from parallel_dbms_spark.operators.mv import mv_sync_txlog
    from parallel_dbms_spark.sources import txlog

    base = str(tmp_path)
    t, p = base + "/t", base + "/mv"
    txlog.tx_append(
        spark.createDataFrame([(1, "a", 5)], "k long, g string, v long"), t
    )
    define_mv(
        txlog.read_snapshot(spark, t), p, ["g"], {"s": ("sum", "v")}
    )
    txlog.tx_append(
        spark.createDataFrame([(2, "a", 6)], "k long, g string, v long"), t
    )
    with pytest.raises(ValueError, match="count measure"):
        mv_sync_txlog(spark, p, t)


def test_sync_requires_a_version_anchor(spark, tmp_path):
    """define_mv without synced_version then mv_sync_txlog must raise,
    not silently replay the defining commits (which would double-count
    every sum/count); an explicit from_version= overrides."""
    from parallel_dbms_spark.operators.mv import mv_sync_txlog
    from parallel_dbms_spark.sources import txlog

    base = str(tmp_path)
    t, p = base + "/t", base + "/mv"
    txlog.tx_append(
        spark.createDataFrame(
            [(i, "a", 10) for i in range(4)], "k long, g string, v long"
        ),
        t,
    )
    define_mv(
        txlog.read_snapshot(spark, t), p, ["g"],
        {"n": ("count", "v"), "s": ("sum", "v")},
    )
    txlog.tx_append(
        spark.createDataFrame([(9, "a", 7)], "k long, g string, v long"), t
    )
    with pytest.raises(ValueError, match="synced_version"):
        mv_sync_txlog(spark, p, t)
    # explicit anchor: fold only the post-define commit
    mv_sync_txlog(spark, p, t, from_version=1)
    row = spark.read.parquet(p).collect()[0]
    assert (row.n, row.s) == (5, 47)


def test_promote_leaves_no_sidecarless_window(spark, tmp_path):
    """The staged directory carries its _mv.json BEFORE the swap, so a
    crash between the renames leaves either the old complete view or
    the new complete view (rename-aside, streaming/sinks.py pattern)."""
    import os

    from parallel_dbms_spark.operators.mv import mv_answer, mv_sync_txlog
    from parallel_dbms_spark.sources import txlog

    base = str(tmp_path)
    t, p = base + "/t", base + "/mv"
    txlog.tx_append(
        spark.createDataFrame([(1, "a", 5)], "k long, g string, v long"), t
    )
    define_mv(
        txlog.read_snapshot(spark, t), p, ["g"],
        {"n": ("count", "v"), "s": ("sum", "v")},
        synced_version=txlog.log_versions(t)[-1],
    )
    txlog.tx_append(
        spark.createDataFrame([(2, "a", 6)], "k long, g string, v long"), t
    )
    mv_sync_txlog(spark, p, t)
    # post-conditions of the atomic promote: view complete, sidecar
    # advanced, no leftover staged/old directories
    assert os.path.exists(os.path.join(p, "_mv.json"))
    assert not os.path.exists(p + "__staged")
    assert not os.path.exists(p + "__old")
    got = mv_answer(spark, p, ["g"], {"s": ("sum", "v")}).collect()[0]
    assert got.s == 11


def test_interrupted_swap_window_recovers_on_next_read(spark, tmp_path):
    """The promote is two renames; a crash between them leaves the view
    stranded at path__old with nothing at path. The next read (or the
    next promote) must roll that back instead of failing on a missing
    view."""
    import os

    from parallel_dbms_spark.operators.mv import mv_answer

    p = str(tmp_path / "mv")
    df = spark.createDataFrame([(1, "a", 5), (2, "b", 7)], "k long, g string, v long")
    define_mv(df, p, ["g"], {"n": ("count", "v"), "s": ("sum", "v")})
    # simulate the crash window: first rename done, second never ran
    os.replace(p, p + "__old")
    assert not os.path.exists(p)
    got = {(r.g, r.s) for r in mv_answer(spark, p, ["g"], {"s": ("sum", "v")}).collect()}
    assert got == {("a", 5), ("b", 7)}
    assert os.path.exists(p) and not os.path.exists(p + "__old")


def test_sync_wide_delete_uses_non_broadcast_path(spark, tmp_path):
    """A delete touching more groups than broadcast_touched_max must
    still sync exactly — through plain shuffle joins instead of a
    driver-side broadcast of the touched-key set."""
    from parallel_dbms_spark.operators.mv import mv_sync_txlog
    from parallel_dbms_spark.sources import txlog

    base = str(tmp_path)
    t, p = base + "/t", base + "/mv"
    txlog.tx_append(
        spark.createDataFrame(
            [(i, f"g{i % 40}", i * 10) for i in range(400)],
            "k long, g string, v long",
        ),
        t,
    )
    define_mv(
        txlog.read_snapshot(spark, t), p, ["g"],
        {"n": ("count", "v"), "s": ("sum", "v"),
         "mn": ("min", "v"), "mx": ("max", "v")},
        synced_version=txlog.log_versions(t)[-1],
    )
    # wide delete: touches every one of the 40 groups
    txlog.tx_delete_where(spark, t, "v >= 2000")
    mv_sync_txlog(spark, p, t, broadcast_touched_max=5)
    got = {
        r.g: (r.n, r.s, r.mn, r.mx)
        for r in spark.read.parquet(p).collect()
    }
    assert got == _recompute(spark, t)
