"""As-of join vs DuckDB's native ASOF JOIN on randomized data, plus the
edge cases (NULL value in the matched row, simultaneous timestamps,
left/inner difference) that a composition bug would break."""

from __future__ import annotations
import pytest

import random

import duckdb
from pyspark.sql import Row

from parallel_dbms_spark.operators import asof_join


def _frames(spark, seed=5, n_left=300, n_right=120, n_keys=12):
    rng = random.Random(seed)
    left = [Row(k=rng.randrange(n_keys), ts=rng.randrange(10_000), lv=i) for i in range(n_left)]
    right = [
        Row(k=rng.randrange(n_keys), ts=rng.randrange(10_000), rv=float(i))
        for i in range(n_right)
    ]
    return spark.createDataFrame(left), spark.createDataFrame(right)


def test_asof_matches_duckdb(spark):
    l, r = _frames(spark)
    got = sorted(
        (row.k, row.ts, row.lv, row.r_rv)
        for row in asof_join(l, r, on="k", left_ts="ts", right_ts="ts", right_values=["rv"]).collect()
    )
    con = duckdb.connect()
    con.register("l", l.toPandas())
    con.register("r", r.toPandas())
    want = sorted(
        map(
            tuple,
            con.sql(
                """SELECT l.k, l.ts, l.lv, r.rv FROM l ASOF JOIN r
                   ON l.k = r.k AND l.ts >= r.ts"""
            ).fetchall(),
        )
    )
    assert got == want


def test_asof_left_keeps_unmatched(spark):
    l = spark.createDataFrame([Row(k=1, ts=10), Row(k=2, ts=10)])
    r = spark.createDataFrame([Row(k=1, ts=5, rv=1.0)])
    out = asof_join(l, r, on="k", left_ts="ts", right_ts="ts", right_values=["rv"], how="left")
    rows = {row.k: row.r_rv for row in out.collect()}
    assert rows == {1: 1.0, 2: None}


def test_asof_inner_keeps_null_valued_match(spark):
    # The match marker must be row-existence, not value-non-nullness.
    l = spark.createDataFrame([(1, 10)], "k int, ts int")
    r = spark.createDataFrame([(1, 10, None)], "k int, ts int, rv double")
    out = asof_join(l, r, on="k", left_ts="ts", right_ts="ts", right_values=["rv"]).collect()
    assert len(out) == 1 and out[0].r_rv is None


def test_asof_null_value_does_not_leak_older_value(spark):
    # Most recent right row has rv=NULL; an ignorenulls-per-column
    # implementation would wrongly surface the OLDER 7.0.
    l = spark.createDataFrame([(1, 20)], "k int, ts int")
    r = spark.createDataFrame([(1, 5, 7.0), (1, 15, None)], "k int, ts int, rv double")
    out = asof_join(l, r, on="k", left_ts="ts", right_ts="ts", right_values=["rv"]).collect()
    assert len(out) == 1 and out[0].r_rv is None


def test_resample_ffill_semantics(spark):
    # Hand-built series: obs at 00:10 (v=1.0) and 02:30 (v=5.0).
    # Hourly grid floor(00:10)=00:00 .. floor(02:30)=02:00.
    # 00:00 has no obs at-or-before -> dropped (inner); 01:00 and
    # 02:00 carry v=1.0 forward.
    import datetime
    from pyspark.sql import Row
    from parallel_dbms_spark.operators import resample_ffill

    rows = [
        Row(user_id=1, ts=datetime.datetime(2024, 1, 1, 0, 10), value=1.0),
        Row(user_id=1, ts=datetime.datetime(2024, 1, 1, 2, 30), value=5.0),
    ]
    out = {
        (r.user_id, r.grid_ts.hour): r.r_value
        for r in resample_ffill(spark.createDataFrame(rows)).collect()
    }
    assert out == {(1, 1): 1.0, (1, 2): 1.0}


def test_resample_interpolate_semantics(spark):
    # Hand-built series: obs at 00:00 (v=1.0) and 02:00 (v=5.0).
    # Grid 00:00..02:00. 00:00 and 02:00 sit ON observations (exact
    # bracket both sides -> the observation itself); 01:00 is the
    # exact midpoint -> lerp( 1e6, 5e6, 0.5 ) = 3e6 micro-units.
    # Integer-lerp exactness: (1e6*3600 + 5e6*3600) / 7200 = 3e6.
    import datetime
    from pyspark.sql import Row
    from parallel_dbms_spark.operators import resample_interpolate

    rows = [
        Row(user_id=1, ts=datetime.datetime(2024, 1, 1, 0, 0), value=1.0),
        Row(user_id=1, ts=datetime.datetime(2024, 1, 1, 2, 0), value=5.0),
    ]
    out = {
        (r.user_id, r.grid_ts.hour): r.r_value_e6
        for r in resample_interpolate(spark.createDataFrame(rows)).collect()
    }
    assert out == {
        (1, 0): 1_000_000.0, (1, 1): 3_000_000.0, (1, 2): 5_000_000.0,
    }
    # vs ffill on the same series: the forward fill would hold 1.0 at
    # 01:00 — interpolation is the different (and here exact) answer
    # Asymmetric gap: obs at 00:00 (v=0.0) and 03:00 (v=3.0) -> the
    # line passes 1.0 at 01:00 and 2.0 at 02:00
    rows2 = [
        Row(user_id=2, ts=datetime.datetime(2024, 1, 1, 0, 0), value=0.0),
        Row(user_id=2, ts=datetime.datetime(2024, 1, 1, 3, 0), value=3.0),
    ]
    out2 = {
        r.grid_ts.hour: r.r_value_e6
        for r in resample_interpolate(spark.createDataFrame(rows2)).collect()
    }
    assert out2 == {0: 0.0, 1: 1_000_000.0, 2: 2_000_000.0,
                    3: 3_000_000.0}
    # single off-grid observation: its floor()-hour grid point lies
    # BEFORE the observation, so no backward bracket exists and the
    # point drops (inner) — no divide-by-zero, no fabricated value
    rows3 = [
        Row(user_id=3, ts=datetime.datetime(2024, 1, 1, 1, 30), value=7.5),
    ]
    assert resample_interpolate(spark.createDataFrame(rows3)).count() == 0
    # single ON-grid observation: exact bracket on both sides, den=0
    # path returns the observation itself
    rows4 = [
        Row(user_id=4, ts=datetime.datetime(2024, 1, 1, 1, 0), value=7.5),
    ]
    out4 = [
        (r.grid_ts.hour, r.r_value_e6)
        for r in resample_interpolate(spark.createDataFrame(rows4)).collect()
    ]
    assert out4 == [(1, 7_500_000.0)]


def test_resample_interpolate_null_values_and_step(spark):
    # NULL-valued rows are NOT observations: an all-null timestamp at
    # 01:00 between obs (00:00, v=1.0) and (02:00, v=5.0) must not
    # desynchronize the bracket (the pre-fix bug lerped a non-null
    # __sec from 01:00 against an older __v_e6) — the grid point at
    # 01:00 still lerps 00:00..02:00 to the midpoint 3e6
    import datetime
    from pyspark.sql import Row
    import pyspark.sql.types as T
    from parallel_dbms_spark.operators import resample_interpolate

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    rows = [
        Row(user_id=1, ts=datetime.datetime(2024, 1, 1, 0, 0), value=1.0),
        Row(user_id=1, ts=datetime.datetime(2024, 1, 1, 1, 0), value=None),
        Row(user_id=1, ts=datetime.datetime(2024, 1, 1, 2, 0), value=5.0),
    ]
    out = {
        (r.user_id, r.grid_ts.hour): r.r_value_e6
        for r in resample_interpolate(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    assert out == {
        (1, 0): 1_000_000.0, (1, 1): 3_000_000.0, (1, 2): 5_000_000.0,
    }
    # a key whose EVERY value is null contributes no grid at all
    rows_all_null = rows + [
        Row(user_id=9, ts=datetime.datetime(2024, 1, 1, 0, 30), value=None),
    ]
    out2 = resample_interpolate(
        spark.createDataFrame(rows_all_null, schema)
    )
    assert out2.filter("user_id = 9").count() == 0
    # generic step: '30 minutes' anchors the grid at the minute (not a
    # hardcoded hour) and lerps the 00:30/01:30 midpoints exactly
    out3 = {
        (r.grid_ts.hour, r.grid_ts.minute): r.r_value_e6
        for r in resample_interpolate(
            spark.createDataFrame(rows, schema), step="30 minutes"
        ).collect()
    }
    assert out3[(0, 30)] == 2_000_000.0
    assert out3[(1, 30)] == 4_000_000.0
    # unsupported step text raises instead of silently hour-anchoring
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported step"):
        resample_interpolate(
            spark.createDataFrame(rows, schema), step="90 sec"
        ).collect()


def test_forward_asof_picks_earliest_at_or_after(spark):
    from pyspark.sql import Row

    from parallel_dbms_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [Row(k=1, lts=5), Row(k=1, lts=7), Row(k=1, lts=21), Row(k=2, lts=1)]
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=7, v="a"), Row(k=1, rts=10, v="b"), Row(k=1, rts=20, v="c")]
    )
    got = {
        (r.k, r.lts): r.r_v
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_values=["v"], direction="forward",
        ).collect()
    }
    # simultaneous right row IS visible; strictly-later rows pick the next
    assert got == {(1, 5): "a", (1, 7): "a"}  # lts=21 and k=2 have no next -> dropped
    # outer keeps the unmatched rows with NULL
    outer = {
        (r.k, r.lts): r.r_v
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_values=["v"], how="left", direction="forward",
        ).collect()
    }
    assert outer[(1, 21)] is None and outer[(2, 1)] is None and outer[(1, 5)] == "a"


def test_asof_join_composite_key(spark):
    import datetime as dt

    from pyspark.sql import Row

    from parallel_dbms_spark.operators.asof import asof_join

    t = lambda d: dt.datetime(2024, 1, d)
    left = spark.createDataFrame([
        Row(a=1, b="x", lts=t(5)),
        Row(a=1, b="y", lts=t(5)),   # same a, different b -> different match
        Row(a=2, b="x", lts=t(5)),
    ])
    right = spark.createDataFrame([
        Row(a=1, b="x", rts=t(1), v="ax1"),
        Row(a=1, b="x", rts=t(4), v="ax4"),
        Row(a=1, b="y", rts=t(2), v="ay2"),
        Row(a=2, b="x", rts=t(9), v="late"),  # after left ts -> no match
    ])
    got = {(r.a, r.b): r.r_v for r in asof_join(
        left, right, on=["a", "b"], left_ts="lts", right_ts="rts",
        right_values=["v"],
    ).collect()}
    assert got == {(1, "x"): "ax4", (1, "y"): "ay2"}


def test_interval_overlap_join_exact_pairs_no_dups(spark):
    import datetime as dt

    from pyspark.sql import Row

    from parallel_dbms_spark.operators.range_join import interval_overlap_join

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    left = spark.createDataFrame([
        Row(k=1, lid=1, ls=t(1), le=t(3)),      # overlaps r1, r2
        Row(k=1, lid=2, ls=t(10), le=t(11)),    # overlaps nothing
        Row(k=1, lid=3, ls=t(4), le=t(4)),      # point interval, touches r2 end
        Row(k=2, lid=4, ls=t(1), le=t(3)),      # other key
        Row(k=1, lid=5, ls=t(5), le=t(4)),      # invalid (end<start) -> dropped
    ])
    right = spark.createDataFrame([
        Row(k=1, rid=1, rs=t(0), re=t(1, 30)),  # long overlap with lid=1
        Row(k=1, rid=2, rs=t(2, 30), re=t(4)),  # overlaps lid=1 AND lid=3
        Row(k=2, rid=3, rs=t(2), re=t(2, 30)),
    ])
    got = sorted(
        (r.lid, r.r_rid)
        for r in interval_overlap_join(
            left, right, on="k",
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_seconds=1800,
        ).collect()
    )
    # each overlapping pair EXACTLY once despite multi-cell overlaps
    assert got == [(1, 1), (1, 2), (3, 2), (4, 3)]


def test_interval_overlap_join_caps_runaway_intervals(spark):
    import datetime as dt

    from pyspark.sql import Row

    from parallel_dbms_spark.operators.range_join import interval_overlap_join

    left = spark.createDataFrame([
        Row(k=1, lid=1, ls=dt.datetime(2024, 1, 1), le=dt.datetime(2024, 1, 1, 2)),
        # dirty: year-9999 end would be ~70M hourly cells -> dropped
        Row(k=1, lid=2, ls=dt.datetime(2024, 1, 1), le=dt.datetime(9999, 1, 1)),
    ])
    right = spark.createDataFrame([
        Row(k=1, rid=1, rs=dt.datetime(2024, 1, 1, 1), re=dt.datetime(2024, 1, 1, 3)),
    ])
    got = [
        (r.lid, r.r_rid)
        for r in interval_overlap_join(
            left, right, on="k",
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_seconds=3600,
        ).collect()
    ]
    assert got == [(1, 1)]  # clean pair joins; the runaway row is dropped


def test_asof_tolerance_bounds_staleness(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [Row(k=1, ts=at(0), lv=1),    # match 30 min old -> inside 2h
         Row(k=2, ts=at(0), lv=2),    # match exactly 120 min old -> kept (<=)
         Row(k=3, ts=at(0), lv=3),    # match 121 min old -> dropped
         Row(k=4, ts=at(0), lv=4)]    # no match at all
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=at(-30), rv=10.0),
         Row(k=2, ts=at(-120), rv=20.0),
         Row(k=3, ts=at(-121), rv=30.0)]
    )
    inner = {
        r.lv: r.r_rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_values=["rv"], tolerance="2 hours",
        ).collect()
    }
    assert inner == {1: 10.0, 2: 20.0}

    left_join = {
        r.lv: r.r_rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_values=["rv"], how="left", tolerance="2 hours",
        ).collect()
    }
    assert left_join == {1: 10.0, 2: 20.0, 3: None, 4: None}


def test_asof_tolerance_forward_direction(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([Row(k=1, ts=t0, lv=1), Row(k=2, ts=t0, lv=2)])
    right = spark.createDataFrame(
        [Row(k=1, ts=t0 + dt.timedelta(minutes=10), rv=1.5),
         Row(k=2, ts=t0 + dt.timedelta(hours=3), rv=2.5)]
    )
    got = {
        r.lv: r.r_rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_values=["rv"], direction="forward", tolerance="1 hour",
        ).collect()
    }
    assert got == {1: 1.5}


def test_asof_nearest_direction_semantics(spark):
    import datetime as dt

    from parallel_dbms_spark.operators import asof_join

    T = dt.datetime
    left = spark.createDataFrame(
        [
            (1, 1, T(2024, 1, 1, 10, 0)),   # between: back 9:00, fwd 10:30 -> fwd
            (2, 1, T(2024, 1, 1, 9, 10)),   # back 9:00 (10m) vs fwd 10:30 -> back
            (3, 1, T(2024, 1, 1, 8, 0)),    # before first right -> forward
            (4, 1, T(2024, 1, 1, 11, 0)),   # after last right -> backward
            (5, 1, T(2024, 1, 1, 9, 45)),   # EXACT tie 45m/45m -> backward
            (6, 2, T(2024, 1, 1, 12, 0)),   # key with no right rows: dropped
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9, 0), 90.0),
            (1, T(2024, 1, 1, 10, 30), 105.0),
        ],
        "k long, rts timestamp, v double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_values=["v"], direction="nearest",
    )
    got = {r["id"]: r["r_v"] for r in out.collect()}
    assert got == {1: 105.0, 2: 90.0, 3: 90.0, 4: 105.0, 5: 90.0}

    # tolerance prunes far matches symmetrically
    tol = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_values=["v"], direction="nearest", tolerance="30 minutes",
    )
    got_tol = {r["id"]: r["r_v"] for r in tol.collect()}
    assert got_tol == {1: 105.0, 2: 90.0, 4: 105.0}


# ---------------------------------------------------------------------------
# Salt-by-time-range fallback (asof_join_sharded): identical semantics,
# (key, shard)-partitioned plan for pathological keys.
# ---------------------------------------------------------------------------
from parallel_dbms_spark.operators import asof_join_sharded  # noqa: E402


def _frames_unique_rts(spark, seed, n_left, n_right, n_keys):
    """Right timestamps UNIQUE per key, so the match is deterministic
    and sharded-vs-unsharded equality is exact (equal right timestamps
    are tie-broken arbitrarily by both plans)."""
    rng = random.Random(seed)
    left = [
        Row(k=rng.randrange(n_keys), ts=rng.randrange(10_000), lv=i)
        for i in range(n_left)
    ]
    seen, right = set(), []
    while len(right) < n_right:
        k, ts = rng.randrange(n_keys), rng.randrange(10_000)
        if (k, ts) not in seen:
            seen.add((k, ts))
            right.append(Row(k=k, ts=ts, rv=float(len(right))))
    return spark.createDataFrame(left), spark.createDataFrame(right)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sharded_asof_equals_unsharded_all_directions(spark):
    l, r = _frames_unique_rts(spark, seed=11, n_left=400, n_right=150, n_keys=7)
    for direction in ("backward", "forward", "nearest"):
        for how in ("inner", "left"):
            kw = dict(
                on="k", left_ts="ts", right_ts="ts", right_values=["rv"],
                how=how, direction=direction,
            )
            assert _rows(asof_join_sharded(l, r, n_shards=16, **kw)) == _rows(
                asof_join(l, r, **kw)
            ), f"{direction}/{how}"


@pytest.mark.slow  # residual: test_sharded_asof_equals_unsharded_all_directions
def test_sharded_asof_tolerance_and_exclusive(spark):
    l, r = _frames_unique_rts(spark, seed=3, n_left=300, n_right=90, n_keys=5)
    # INTERVAL tolerance requires timestamp time columns (same contract
    # as the unsharded path) — lift the integer ts to a timestamp.
    from pyspark.sql import functions as F

    lt = l.withColumn("ts", F.timestamp_seconds(F.col("ts")))
    rt = r.withColumn("ts", F.timestamp_seconds(F.col("ts")))
    for direction in ("backward", "forward", "nearest"):
        kw = dict(
            on="k", left_ts="ts", right_ts="ts", right_values=["rv"],
            how="left", direction=direction, tolerance="500 seconds",
        )
        assert _rows(asof_join_sharded(lt, rt, n_shards=8, **kw)) == _rows(
            asof_join(lt, rt, **kw)
        ), direction
    kw = dict(
        on="k", left_ts="ts", right_ts="ts", right_values=["rv"],
        how="inner", direction="backward", allow_exact=False,
    )
    assert _rows(asof_join_sharded(l, r, n_shards=8, **kw)) == _rows(
        asof_join(l, r, **kw)
    )


@pytest.mark.slow  # residual: test_sharded_asof_equals_unsharded_all_directions
def test_sharded_asof_pathological_single_key(spark):
    # ONE key carrying every row — the exact case the unsharded plan's
    # docstring flags (single key >> one partition). The sharded plan
    # must agree row-for-row while spreading the key over 32 shards.
    rng = random.Random(42)
    left = [Row(k=1, ts=i * 3 + rng.randrange(3), lv=i) for i in range(6000)]
    right = [Row(k=1, ts=ts, rv=float(ts)) for ts in
             sorted(rng.sample(range(20_000), 900))]
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    for direction in ("backward", "forward", "nearest"):
        kw = dict(
            on="k", left_ts="ts", right_ts="ts", right_values=["rv"],
            how="left", direction=direction,
        )
        got = _rows(asof_join_sharded(l, r, n_shards=32, **kw))
        want = _rows(asof_join(l, r, **kw))
        assert got == want, direction
    # degenerate inputs fall back cleanly
    empty = spark.createDataFrame([], l.schema)
    assert asof_join_sharded(
        empty, r, on="k", left_ts="ts", right_ts="ts", right_values=["rv"]
    ).count() == 0


def test_resample_ffill_sharded_timeline_equals_default(spark):
    from parallel_dbms_spark.operators import resample_ffill

    rng = random.Random(9)
    rows = [
        Row(
            user_id=rng.randrange(4),
            ts=__import__("datetime").datetime(2024, 1, 1)
            + __import__("datetime").timedelta(minutes=rng.randrange(5000)),
            value=float(i),
        )
        for i in range(400)
    ]
    ev = spark.createDataFrame(rows)
    a = resample_ffill(ev)
    b = resample_ffill(ev, shard_timeline=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_radius_neighbor_pairs_matches_naive_quadratic(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.operators import radius_neighbor_pairs

    rng = random.Random(7)
    pts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(600)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    r = 3.0
    got = sorted(
        (row.id_a, row.id_b, round(row.dist, 9))
        for row in radius_neighbor_pairs(df, radius=r).collect()
    )
    a, b = df.alias("a"), df.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) ** 2 + (F.col("a.y") - F.col("b.y")) ** 2
    want = sorted(
        (row["ia"], row["ib"], round(row["d"], 9))
        for row in a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(d2 <= r * r)
        .select(
            F.col("a.id").alias("ia"), F.col("b.id").alias("ib"),
            F.sqrt(d2).alias("d"),
        )
        .collect()
    )
    assert got == want and len(got) > 50
    # boundary: exactly-r pairs kept, cross-cell neighbors found
    edge = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 3.0, 0.0), (3, 2.999, 2.999), (4, 50.0, 50.0)],
        "id long, x double, y double",
    )
    pairs = {
        (row.id_a, row.id_b)
        for row in radius_neighbor_pairs(edge, radius=3.0).collect()
    }
    assert (1, 2) in pairs
    assert all(4 not in p for p in pairs)


def test_radius_pairs_identical_across_cell_divisors(spark):
    """The r/m-cell + (2m+1)^2-neighborhood grid must produce the
    EXACT same pair set as the base r-cell grid — the hot-cell remedy
    may never change results. The fixture plants one dense downtown
    cell (urban-core skew) plus uniform background so the divisor
    actually re-keys the heavy hitter."""
    from parallel_dbms_spark.operators import radius_neighbor_pairs

    rng = random.Random(11)
    # 300 points crammed into one r-sized cell at (10..13)^2, 300 spread
    pts = [(i, 10.0 + rng.uniform(0, 3), 10.0 + rng.uniform(0, 3))
           for i in range(300)]
    pts += [(300 + i, rng.uniform(0, 100), rng.uniform(0, 100))
            for i in range(300)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    r = 3.0

    def pairset(m):
        return sorted(
            (row.id_a, row.id_b, round(row.dist, 9))
            for row in radius_neighbor_pairs(
                df, radius=r, cell_divisor=m
            ).collect()
        )

    base = pairset(1)
    assert len(base) > 40000  # dense cell really is dense
    assert pairset(2) == base
    assert pairset(3) == base

    # the divisor splits the hot cell into more, smaller join keys
    import pyspark.sql.functions as F
    def key_cards(m):
        side = r / m
        return (
            df.groupBy(
                F.floor(F.col("x") / side).cast("long"),
                F.floor(F.col("y") / side).cast("long"),
            )
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    assert key_cards(3) < key_cards(1)


    with pytest.raises(ValueError, match="cell_divisor"):
        radius_neighbor_pairs(df, radius=r, cell_divisor=0)


def test_geo_radius_pairs_matches_naive_haversine(spark):
    import math

    from pyspark.sql import functions as F

    from parallel_dbms_spark.operators import geo_radius_pairs
    from parallel_dbms_spark.operators.range_join import haversine_km

    rng = random.Random(23)
    pts = [(i, rng.uniform(-89, 89), rng.uniform(-180, 180)) for i in range(300)]
    # planted clusters straddling the date line and near a pole —
    # exactly where a degree grid would tear or degenerate
    pts += [
        (1000, 10.0, 179.95), (1001, 10.0, -179.95),   # ~11 km across +-180
        (1002, 88.5, 10.0), (1003, 88.5, 100.0),       # near-pole, ~few hundred km? verified by haversine
        (1004, -45.0, 30.0), (1005, -45.0005, 30.0005),  # ~60 m apart
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    r_km = 500.0
    got = sorted(
        (row.id_a, row.id_b) for row in geo_radius_pairs(df, r_km).collect()
    )
    a, b = df.alias("a"), df.alias("b")
    d = haversine_km(F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon"))
    want = sorted(
        (row["ia"], row["ib"])
        for row in a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(d <= r_km)
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .collect()
    )
    assert got == want and len(got) > 10
    assert (1000, 1001) in got, "date-line pair must be found"
    assert (1004, 1005) in got


def test_longest_prefix_join_hand_rules(spark):
    """8-bit LPM: longest rule wins, non-matching addresses drop,
    ties on length break on the rule tiebreaker."""
    from parallel_dbms_spark.operators.range_join import longest_prefix_join

    rules = spark.createDataFrame(
        [(0b10000000, 2, 10, "A"), (0b10100000, 4, 11, "B"),
         (0b00000000, 2, 12, "C"),
         # duplicate (len, masked-bits) rule with higher id: loses ties
         (0b10111111, 4, 99, "B2")],
        "prefix long, plen int, rid long, label string",
    )
    probe = spark.createDataFrame(
        [(1, 0b10101111), (2, 0b10011111), (3, 0b00111111),
         (4, 0b11111111)],
        "id long, addr long",
    )
    out = {
        r["id"]: (r["match_len"], r["label"], r["rid"])
        for r in longest_prefix_join(
            probe, rules, "addr", "prefix", "plen", bits=8,
            rule_tiebreak="rid",
        ).collect()
    }
    assert out == {1: (4, "B", 11), 2: (2, "A", 10), 3: (2, "C", 12)}
    # plan shape: the rewrite must stay an equi-join, never a
    # broadcast nested loop over the theta condition
    plan = longest_prefix_join(
        probe, rules, "addr", "prefix", "plen", bits=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_resample_interpolate_matches_python_reference(spark):
    """Differential: random irregular multi-key series vs a pure-Python
    bracketing + integer-lerp reference — grid membership AND every
    interpolated value must match exactly (the operator's math is
    integer-exact by construction, so equality is ==, not approx)."""
    import datetime
    import random

    rng = random.Random(412)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for uid in range(6):
        n = rng.randrange(2, 12)
        ts_set = sorted(rng.sample(range(0, 72 * 3600), n))
        for s in ts_set:
            rows.append((
                uid,
                base + datetime.timedelta(seconds=s),
                round(rng.uniform(-50, 50), 3),
            ))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    from parallel_dbms_spark.operators import resample_interpolate

    got = {
        (r.user_id, r.grid_ts): r.r_value_e6
        for r in resample_interpolate(df).collect()
    }

    # pure-Python reference
    import math
    from collections import defaultdict

    series = defaultdict(dict)
    for uid, ts, v in rows:
        series[uid][ts] = max(series[uid].get(ts, float("-inf")), v)
    want = {}
    epoch = datetime.datetime(1970, 1, 1)
    for uid, obs in series.items():
        pts = sorted(
            (int((t - epoch).total_seconds()),
             math.floor(v * 1_000_000.0))
            for t, v in obs.items()
        )
        t_lo = min(t for t, _ in pts)
        t_hi = max(t for t, _ in pts)
        g = (t_lo // 3600) * 3600
        while g <= (t_hi // 3600) * 3600:
            prev = [(t, v) for t, v in pts if t <= g]
            nxt = [(t, v) for t, v in pts if t >= g]
            if prev and nxt:
                (tp, vp), (tn, vn) = prev[-1], nxt[0]
                val = (
                    float(vp) if tn == tp
                    else (vp * (tn - g) + vn * (g - tp)) / (tn - tp)
                )
                want[(uid, epoch + datetime.timedelta(seconds=g))] = val
            g += 3600
    assert got == want
