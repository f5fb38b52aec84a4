"""Tests for CDC (snapshot diff, merge upsert, apply_changes roundtrip),
batch sessionization, TF-IDF, and vector centroids."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import Row, functions as F

from conftest import SF_SMOKE

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark.functions import vectors
from parallel_dbms_spark.functions.text import tfidf_top_terms
from parallel_dbms_spark.operators import (
    apply_changes,
    merge_upsert,
    session_stats,
    sessionize,
    snapshot_diff,
)


def _snap(spark, rows):
    return spark.createDataFrame([Row(k=k, a=a, b=b) for k, a, b in rows])


def test_snapshot_diff_classifies(spark):
    old = _snap(spark, [(1, "x", 1), (2, "y", 2), (3, "z", 3), (4, None, 4)])
    new = _snap(spark, [(2, "y", 2), (3, "z", 99), (4, None, 4), (5, "w", 5)])
    got = {
        r.k: (r.change_type, r.a, r.b)
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    # 1 deleted (pre-image), 3 updated (post-image), 5 inserted;
    # 2 unchanged and 4 unchanged-with-NULL (null-safe compare) dropped.
    assert got == {
        1: ("D", "x", 1),
        3: ("U", "z", 99),
        5: ("I", "w", 5),
    }


def test_apply_changes_roundtrip(spark):
    old = _snap(spark, [(1, "x", 1), (2, "y", 2), (3, "z", 3)])
    new = _snap(spark, [(2, "y", 20), (3, "z", 3), (4, "w", 4)])
    diff = snapshot_diff(old, new, keys=["k"])
    rebuilt = apply_changes(old, diff, keys=["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_merge_upsert_source_wins(spark):
    tgt = _snap(spark, [(1, "x", 1), (2, "y", 2)])
    src = _snap(spark, [(2, "Y", 22), (3, "n", 3)])
    got = sorted(map(tuple, merge_upsert(tgt, src, keys=["k"]).collect()))
    assert got == [(1, "x", 1), (2, "Y", 22), (3, "n", 3)]


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_sessionize_splits_on_gap(spark):
    # user 1: events at t+0,10,20 then a 45-min gap then t+65,70 -> 2 sessions
    # user 2: single event -> 1 session
    rows = [
        Row(event_id=i, user_id=u, ts=_ts(m))
        for i, (u, m) in enumerate(
            [(1, 0), (1, 10), (1, 20), (1, 65), (1, 70), (2, 5)]
        )
    ]
    ev = spark.createDataFrame(rows)
    s = sessionize(ev, gap_minutes=30)
    seqs = {
        (r.user_id, r.ts.hour * 60 + r.ts.minute): r.session_seq
        for r in s.collect()
    }
    assert seqs[(1, 0)] == seqs[(1, 10)] == seqs[(1, 20)] == 1
    assert seqs[(2, 5)] == 1  # user 2's single event
    assert seqs[(1, 65)] == seqs[(1, 70)] == 2

    stats = {
        (r.user_id, r.session_seq): (r.n_events, r.duration_s)
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert stats[(1, 1)] == (3, 1200)
    assert stats[(1, 2)] == (2, 300)
    assert stats[(2, 1)] == (1, 0)


def test_sessionize_events_covers_all_rows(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    stats = session_stats(ev)
    total = stats.agg(F.sum("n_events").alias("n")).collect()[0].n
    assert total == ev.count()


def test_tfidf_unique_term_ranks_first(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat xylophone"),
            Row(doc_id=2, text="the dog sat on the log"),
            Row(doc_id=3, text="the cat and the dog"),
        ]
    )
    top = tfidf_top_terms(docs, k=2)
    first = {r.doc_id: r.term for r in top.filter(F.col("rk") == 1).collect()}
    # doc 1's unique terms (df=1: 'mat', 'xylophone') share the max
    # score; the deterministic term-asc tiebreak picks 'mat'.
    assert first[1] == "mat"
    doc1_top2 = {r.term for r in top.filter(F.col("doc_id") == 1).collect()}
    assert doc1_top2 == {"mat", "xylophone"}
    # 'the' appears in every doc -> idf 0 -> never in any top-2.
    assert top.filter(F.col("term") == "the").count() == 0


def test_centroids_match_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {r.label: np.array(r.centroid) for r in vectors.centroids(emb).collect()}
    pdf = emb.toPandas()
    for label, grp in pdf.groupby("label"):
        want = np.mean(np.stack(grp["embedding"].map(np.asarray)), axis=0)
        assert np.allclose(got[label], want, atol=1e-6)


def test_quantized_centroids_consistent_with_natural(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = vectors.quantized_centroid_sums(emb, scale=1e6)
    nat = {r.label: r.centroid for r in vectors.centroids(emb).collect()}
    for r in q.collect():
        approx = r.sum_scaled / (r.n * 1e6)
        # floor-quantization at 1e-6 -> within 1e-6 of the true mean
        assert abs(approx - nat[r.label][r.pos]) < 2e-6


# ---------------------------------------------------------------- SCD2
def _feed(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=dt.datetime(2024, 1, d), seq=s, st=st) for k, d, s, st in rows]
    )


def test_scd2_collapses_and_intervals(spark):
    from parallel_dbms_spark.operators import scd2_history

    feed = _feed(
        spark,
        [
            # key 1: A, A (collapse), B, B (collapse), A again (new interval)
            (1, 1, 0, "A"),
            (1, 2, 0, "A"),
            (1, 3, 0, "B"),
            (1, 4, 0, "B"),
            (1, 5, 0, "A"),
            # key 2: single state
            (2, 1, 0, "Z"),
        ],
    )
    out = scd2_history(
        feed, keys=["k"], ts_col="ts", attr_cols=["st"], tiebreak=["seq"]
    )
    rows = sorted(
        (r.k, r.st, r.valid_from.day, r.valid_to.day if r.valid_to else None, r.is_current)
        for r in out.collect()
    )
    assert rows == [
        (1, "A", 1, 3, False),
        (1, "A", 5, None, True),
        (1, "B", 3, 5, False),
        (2, "Z", 1, None, True),
    ]


def test_scd2_null_state_and_tiebreak(spark):
    from parallel_dbms_spark.operators import scd2_history

    feed = _feed(
        spark,
        [
            # NULL state is a real state; consecutive NULLs collapse
            (7, 1, 0, None),
            (7, 1, 1, None),  # same ts, ordered by seq
            (7, 2, 0, "X"),
            (7, 3, 0, None),
        ],
    )
    out = scd2_history(
        feed, keys=["k"], ts_col="ts", attr_cols=["st"], tiebreak=["seq"]
    )
    rows = sorted(
        ((r.st or "-"), r.valid_from.day, r.valid_to.day if r.valid_to else None)
        for r in out.collect()
    )
    assert rows == [("-", 1, 2), ("-", 3, None), ("X", 2, 3)]


def test_scd2_exactly_one_current_per_key(spark):
    from parallel_dbms_spark.operators import scd2_history

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    out = scd2_history(
        ev, keys=["user_id"], ts_col="ts",
        attr_cols=["event_type"], tiebreak=["event_id"],
    ).cache()
    n_keys = ev.select("user_id").distinct().count()
    cur = out.filter(F.col("is_current")).groupBy("user_id").count()
    assert cur.count() == n_keys
    assert cur.filter(F.col("count") != 1).count() == 0
    # intervals tile: every non-current interval's valid_to equals the
    # next interval's valid_from (no gaps, no overlaps)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = out.withColumn("nxt_from", F.lead("valid_from").over(w))
    bad = nxt.filter(
        (F.col("valid_to").isNotNull()) & (F.col("valid_to") != F.col("nxt_from"))
    )
    assert bad.count() == 0
    out.unpersist()


def test_pit_enrich_sees_past_state_never_future(spark):
    from parallel_dbms_spark.operators.cdc import pit_enrich, scd2_history

    feed = _feed(
        spark,
        [(1, 1, 0, "A"), (1, 5, 0, "B"), (1, 9, 0, "C"), (2, 3, 0, "Z")],
    )
    dim = scd2_history(
        feed, keys=["k"], ts_col="ts", attr_cols=["st"], tiebreak=["seq"]
    )
    facts = spark.createDataFrame(
        [
            Row(k=1, fid=10, fts=dt.datetime(2024, 1, 1)),   # exactly at A
            Row(k=1, fid=11, fts=dt.datetime(2024, 1, 4)),   # inside A
            Row(k=1, fid=12, fts=dt.datetime(2024, 1, 5)),   # exactly at B
            Row(k=1, fid=13, fts=dt.datetime(2024, 1, 30)),  # after last -> C
            Row(k=2, fid=14, fts=dt.datetime(2024, 1, 2)),   # before first
            Row(k=3, fid=15, fts=dt.datetime(2024, 1, 2)),   # unknown key
        ]
    )
    got = {r.fid: r.r_st for r in pit_enrich(
        facts, dim, key="k", fact_ts="fts", attr_cols=["st"]
    ).collect()}
    assert got == {10: "A", 11: "A", 12: "B", 13: "C"}  # 14,15 dropped (inner)
    left = {r.fid: r.r_st for r in pit_enrich(
        facts, dim, key="k", fact_ts="fts", attr_cols=["st"], how="left"
    ).collect()}
    assert left[14] is None and left[15] is None and len(left) == 6


def test_state_durations_sum_to_horizon_span(spark):
    from parallel_dbms_spark.operators.cdc import scd2_history, state_durations

    feed = _feed(
        spark, [(1, 1, 0, "A"), (1, 5, 0, "B"), (1, 11, 0, "A"), (2, 3, 0, "Z")]
    )
    dim = scd2_history(
        feed, keys=["k"], ts_col="ts", attr_cols=["st"], tiebreak=["seq"]
    )
    horizon = dt.datetime(2024, 1, 31)
    out = state_durations(dim, ["k"], ["st"], horizon).collect()
    by = {(r.k, r.st): (r.total_s, r.n_intervals) for r in out}
    day = 86_400
    # k=1: A for [1,5)=4d + [11,31)=20d in 2 intervals; B for [5,11)=6d
    assert by[(1, "A")] == (24 * day, 2)
    assert by[(1, "B")] == (6 * day, 1)
    # per-key totals cover first-change -> horizon exactly (tiling)
    assert sum(s for (k, _), (s, _n) in by.items() if k == 1) == 30 * day
    assert by[(2, "Z")] == (28 * day, 1)


def test_centroid_drift_zero_for_identical_cohorts_positive_for_shifted(spark):
    import numpy as np

    from parallel_dbms_spark.functions.vectors import centroid_drift

    rng = np.random.default_rng(13)
    base = [[float(x) for x in rng.normal(size=8)] for _ in range(40)]
    # cohort A = cohort B exactly -> drift 0
    rows = [(i, 0, v) for i, v in enumerate(base)]
    rows += [(100 + i, 0, v) for i, v in enumerate(base)]
    # label 1: cohort B shifted -> strictly positive drift
    rows += [(200 + i, 1, v) for i, v in enumerate(base)]
    rows += [(300 + i, 1, [x + 0.5 for x in v]) for i, v in enumerate(base)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {r.label: r.drift_num for r in centroid_drift(
        df, F.col("vec_id") % 200 < 100
    ).collect()}
    assert out[0] == 0
    assert out[1] > 0
