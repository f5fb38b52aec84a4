"""Tests for the skew-salted join, grouping wrappers, and approximate
distinct."""

from __future__ import annotations

import random

from pyspark.sql import Row, functions as F

from conftest import SF_SMOKE

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark.operators import grouping_agg, join_skew_salted, join_tables


def test_salted_join_equals_plain_join(spark):
    # 90% of left rows share one hot key — the salted plan must return
    # exactly the plain join's result.
    rng = random.Random(3)
    left = spark.createDataFrame(
        [Row(k=(7 if rng.random() < 0.9 else rng.randrange(20)), lv=i) for i in range(2000)]
    )
    right = spark.createDataFrame([Row(rk=i, rv=f"r{i}") for i in range(20)])
    plain = join_tables(left, right, [("k", "=", "rk")])
    salted = join_skew_salted(left, right, "k", "rk", salt=8)
    a = sorted((r.k, r.lv, r.rv) for r in plain.collect())
    b = sorted((r.k, r.lv, r.rv) for r in salted.collect())
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([Row(k=1, lv=1), Row(k=99, lv=2)])
    right = spark.createDataFrame([Row(rk=1, rv="x")])
    out = join_skew_salted(left, right, "k", "rk", salt=4, how="left")
    rows = {r.lv: r.rv for r in out.collect()}
    assert rows == {1: "x", 2: None}


def test_grouping_agg_rollup_counts(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    out = grouping_agg(o, ["o_orderstatus"], [("count", "*", "n")], mode="rollup")
    rows = {r.o_orderstatus: r.n for r in out.collect()}
    total = o.count()
    assert rows[None] == total  # grand-total row
    assert sum(v for k, v in rows.items() if k is not None) == total


def test_approx_distinct_close_to_exact(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    approx = o.agg(F.approx_count_distinct("o_custkey").alias("a")).collect()[0].a
    exact = o.select("o_custkey").distinct().count()
    assert abs(approx - exact) / exact < 0.05


def test_count_min_sketch_tracks_exact_counts(spark):
    # Sketch surface: a count-min sketch built distributed (partial
    # sketches merged by the aggregate) must estimate key frequencies
    # within eps*N of exact, and never under-count.
    from pyspark.sql import functions as F
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_returnflag").cast("string").alias("k")
    )
    sk_bytes = li.agg(
        F.count_min_sketch("k", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("s")
    ).collect()[0]["s"]
    exact = {r.k: r.cnt for r in li.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    n = sum(exact.values())
    jvm = spark._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(sk_bytes))
    for k, cnt in exact.items():
        est = sketch.estimateCount(k)
        assert cnt <= est <= cnt + 0.001 * n + 1


def test_approx_percentile_close_to_exact(spark):
    from parallel_dbms_spark.queries import REGISTRY

    li = load_table(spark, SF_SMOKE, "lineitem")
    approx = REGISTRY["agg_approx_percentiles"].fn(spark, SF_SMOKE).collect()[0][
        "p50_p95_p99"
    ]
    exact = li.agg(
        F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    ).collect()[0][0]
    for a, e in zip(approx, exact):
        assert abs(a - e) <= 0.01 * abs(e) + 1e-9


def test_hll_reaggregation_close_to_exact(spark):
    from parallel_dbms_spark.queries import REGISTRY

    ev = load_table(spark, SF_SMOKE, "events")
    approx = {
        r.week: r.approx_users
        for r in REGISTRY["agg_hll_reaggregate"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        str(r.week): r.n
        for r in ev.groupBy(
            F.date_trunc("week", F.col("ts")).alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for wk in exact:
        assert abs(approx[wk] - exact[wk]) <= max(0.05 * exact[wk], 2)


def test_check_rules_planted_violations(spark):
    from pyspark.sql import Row

    from parallel_dbms_spark.operators.validate import check_rules

    child = spark.createDataFrame(
        [
            Row(k=1, fk=10, st="A", v=5.0),
            Row(k=1, fk=11, st="B", v=-1.0),   # dup key, bad range
            Row(k=2, fk=99, st="X", v=50.0),   # orphan fk, bad domain
            Row(k=3, fk=None, st="A", v=2.0),  # null fk (not_null + ref skips null)
        ]
    )
    parent = spark.createDataFrame([Row(pk=i) for i in (10, 11, 12)])
    got = {
        r.rule: r.n_violations
        for r in check_rules(
            child,
            not_null=["fk"],
            unique=["k"],
            in_set={"st": ["A", "B"]},
            ranges={"v": (0.0, 100.0)},
            references={"fk": (parent, "pk")},
        ).collect()
    }
    assert got == {
        "not_null:fk": 1,
        "unique:k": 2,       # both rows of the duplicated key count
        "in_set:st": 1,
        "range:v": 1,
        "references:fk": 1,  # 99 is orphaned; NULL fk not counted here
    }


def test_sample_k_per_group_quota_and_determinism(spark):
    from parallel_dbms_spark.functions.sampling import sample_k_per_group

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    s1 = sample_k_per_group(docs, "lang", "doc_id", k=5)
    sizes = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    group_sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(5, group_sizes[lang])
    # deterministic: same draw on repartitioned input
    s2 = sample_k_per_group(docs.repartition(13), "lang", "doc_id", k=5)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    # a different salt draws a different sample
    s3 = sample_k_per_group(docs, "lang", "doc_id", k=5, salt="other")
    assert sorted(map(tuple, s1.collect())) != sorted(map(tuple, s3.collect()))


def test_surrogate_keys_sparse_unique(spark):
    from parallel_dbms_spark.functions.ids import assign_surrogate_keys

    li = load_table(spark, SF_SMOKE, "lineitem").repartition(8)
    n = li.count()
    ids = assign_surrogate_keys(li, "row_id")
    assert ids.select("row_id").distinct().count() == n


def test_surrogate_keys_dense_gap_free(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.functions.ids import assign_surrogate_keys

    li = load_table(spark, SF_SMOKE, "lineitem").repartition(8)
    n = li.count()
    ids = assign_surrogate_keys(li, "row_id", dense=True)
    stats = ids.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("row_id").alias("nd"),
        F.min("row_id").alias("lo"),
        F.max("row_id").alias("hi"),
    ).collect()[0]
    # dense = a gap-free permutation of 0..n-1
    assert (stats.n, stats.nd, stats.lo, stats.hi) == (n, n, 0, n - 1)


# ------------------------------------------------------------ histogram
def test_histogram_merge_exactly_linear_and_totals_reconcile(spark):
    from pyspark.sql import Row, functions as F

    from parallel_dbms_spark.functions.histogram import (
        histogram_merge,
        histogram_sketch,
    )

    import numpy as np

    rng = np.random.default_rng(5)
    vals = list(rng.normal(50, 20, size=4000)) + [-999.0, 999.0]  # clamp edges
    df = spark.createDataFrame([Row(i=i, x=float(v)) for i, v in enumerate(vals)])
    a, b = df.filter("i % 2 = 0"), df.filter("i % 2 = 1")
    whole = {r.bucket: r.cnt for r in
             histogram_sketch(df, "x", 0.0, 100.0, 64).collect()}
    merged = {r.bucket: r.cnt for r in histogram_merge(
        histogram_sketch(a, "x", 0.0, 100.0, 64),
        histogram_sketch(b, "x", 0.0, 100.0, 64),
    ).collect()}
    assert merged == whole
    assert sum(whole.values()) == len(vals)  # clamping loses nothing
    assert 0 in whole and 63 in whole  # out-of-range landed in edges


def test_histogram_quantiles_within_one_bucket_width(spark):
    from pyspark.sql import Row

    from parallel_dbms_spark.functions.histogram import (
        histogram_sketch,
        quantiles_from_histogram,
    )

    import numpy as np

    rng = np.random.default_rng(9)
    vals = [float(v) for v in rng.uniform(0, 100, size=8000)]
    df = spark.createDataFrame([Row(x=v) for v in vals])
    sk = histogram_sketch(df, "x", 0.0, 100.0, 128)
    got = {r.q: r.est for r in
           quantiles_from_histogram(sk, [0.1, 0.5, 0.9, 0.99], 0.0, 100.0, 128).collect()}
    width = 100.0 / 128
    for q in (0.1, 0.5, 0.9, 0.99):
        true = float(np.quantile(vals, q))
        assert abs(got[q] - true) <= width + 1e-9, (q, got[q], true)


def test_histogram_rejects_bad_range(spark):
    import pytest as _pytest

    from parallel_dbms_spark.functions.histogram import histogram_sketch

    df = spark.range(5).selectExpr("cast(id as double) as x")
    with _pytest.raises(ValueError, match="hi > lo"):
        histogram_sketch(df, "x", 10.0, 10.0)


# ---------------------------------------------------------------------------
# bitmap exact-distinct (functions/bitmaps.py)
# ---------------------------------------------------------------------------
def test_bitmap_rollup_equals_count_distinct(spark):
    from parallel_dbms_spark.functions import bitmaps

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("wk"),
        "user_id",
    )
    got = {
        (r["event_type"], r["wk"]): r["n_distinct"]
        for r in bitmaps.rollup_distinct(
            ev, ("event_type", "wk", "day"), ("event_type", "wk"), "user_id"
        ).collect()
    }
    want = {
        (r["event_type"], r["wk"]): r["n"]
        for r in ev.groupBy("event_type", "wk")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_bitmap_merge_is_exact_across_bucket_boundaries(spark):
    # ids straddling the 32768-id bucket boundary, with overlap between
    # the two fine cells — OR-merge must union, not double-count.
    from parallel_dbms_spark.functions import bitmaps

    a = spark.range(32760, 32780).withColumn("cell", F.lit("a"))
    b = spark.range(32770, 32790).withColumn("cell", F.lit("b"))
    df = a.union(b).withColumn("g", F.lit("all"))
    fine = bitmaps.build_bitmaps(df, ("g", "cell"), "id")
    out = bitmaps.count_distinct(
        bitmaps.merge_bitmaps(fine, ("g",)), ("g",)
    ).collect()
    assert out[0]["n_distinct"] == 30  # 32760..32789


def test_bitmap_exact_on_signed_ids(spark):
    # Negative ids get their own buckets (0 holds -32768..0, -1 the
    # next block down): +5 / -5 must NOT collide, and a range spanning
    # several negative and positive buckets stays exact.
    from parallel_dbms_spark.functions import bitmaps

    df = spark.createDataFrame(
        [Row(g="x", id=5), Row(g="x", id=-5), Row(g="x", id=7)]
    )
    out = bitmaps.rollup_distinct(df, ("g",), ("g",), "id").collect()
    assert out[0]["n_distinct"] == 3

    wide = (
        spark.range(-40000, 40000)
        .union(spark.range(-5, 5))  # planted duplicates
        .withColumn("g", F.lit("x"))
    )
    out = bitmaps.rollup_distinct(wide, ("g",), ("g",), "id").collect()
    assert out[0]["n_distinct"] == 80000


# ---------------------------------------------------------------------------
# skyline / Pareto frontier (operators/skyline.py)
# ---------------------------------------------------------------------------
def _skyline_naive(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (x2 <= x and y2 <= y and (x2 < x or y2 < y))
            for j, (x2, y2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def test_skyline_matches_naive_and_is_partition_invariant(spark):
    from parallel_dbms_spark.operators.skyline import skyline_2d

    random.seed(7)
    pts = [(random.randint(0, 50), random.randint(0, 50)) for _ in range(400)]
    pts += [(0, 50), (50, 0), (3, 3), (3, 3)]  # corners + exact dup pair
    df = spark.createDataFrame(
        [Row(i=i, x=x, y=y) for i, (x, y) in enumerate(pts)]
    )
    want = _skyline_naive(pts)
    for parts in (1, 7):
        got = sorted(
            (r.x, r.y) for r in skyline_2d(df.repartition(parts), "x", "y").collect()
        )
        assert got == want


def test_skyline_keeps_equal_duplicates_and_survives_anticorrelated(spark):
    from parallel_dbms_spark.operators.skyline import skyline_2d

    # anti-correlated staircase: EVERY point is on the frontier
    stairs = [(i, 100 - i) for i in range(100)]
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in stairs])
    assert skyline_2d(df, "x", "y").count() == 100

    dup = spark.createDataFrame(
        [Row(x=1, y=1), Row(x=1, y=1), Row(x=0, y=5), Row(x=2, y=2)]
    )
    got = sorted((r.x, r.y) for r in skyline_2d(dup, "x", "y").collect())
    assert got == [(0, 5), (1, 1), (1, 1)]  # dominated (2,2) out, dups in


def test_hll_set_ops_intersection_close_to_exact(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.catalog import load_table
    from parallel_dbms_spark.queries.registry import REGISTRY

    sf = "/root/testdata/sf0.01"
    row = REGISTRY["agg_hll_set_ops"].fn(spark, sf).collect()[0]
    ev = load_table(spark, sf, "events")
    clicks = ev.filter("event_type = 'click'").select("user_id").distinct()
    buys = ev.filter("event_type = 'purchase'").select("user_id").distinct()
    exact = clicks.intersect(buys).count()
    assert exact > 0
    # inclusion-exclusion compounds three sketch errors — allow 10%
    assert abs(row["n_intersect_est"] - exact) / exact < 0.10, (
        row["n_intersect_est"], exact,
    )
    n_union_exact = clicks.union(buys).distinct().count()
    assert abs(row["n_union"] - n_union_exact) / n_union_exact < 0.05


def test_robust_zscore_approx_tracks_exact(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.queries.registry import REGISTRY

    sf = "/root/testdata/sf0.01"
    exact = REGISTRY["robust_zscore_prices"].fn(spark, sf)
    approx = REGISTRY["robust_zscore_prices_approx"].fn(spark, sf)
    assert exact.columns == approx.columns

    def per_group(df):
        return {
            r["l_returnflag"]: r
            for r in df.groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n"),
                F.avg("rz").alias("avg_rz"),
                F.max(F.abs("rz")).alias("max_abs_rz"),
                F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
            )
            .collect()
        }

    ge, ga = per_group(exact), per_group(approx)
    assert set(ge) == set(ga) and ge
    for flag, e in ge.items():
        a = ga[flag]
        assert a["n"] == e["n"] > 0
        # accuracy=10000 => rank error <= 1e-4, so the approx med/mad
        # (hence every rz) sit within a hair of the exact ones
        assert abs(a["avg_rz"] - e["avg_rz"]) < 0.02, (flag, a, e)
        assert abs(a["max_abs_rz"] - e["max_abs_rz"]) / e["max_abs_rz"] < 0.02
        # flag flips confined to the epsilon band around |rz| = 3.5
        assert abs(a["n_outliers"] - e["n_outliers"]) <= max(2, 0.001 * e["n"])
