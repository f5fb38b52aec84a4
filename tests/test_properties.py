"""Metamorphic property tests (SURVEY §5's upgrade over the reference's
test story): algebraic identities that must hold for ANY data, checked
on seeded random frames."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, functions as F

from parallel_dbms_spark.operators import filter_rows, join_tables, set_op


@pytest.fixture(scope="module")
def frame(spark):
    rng = random.Random(17)
    rows = [
        Row(
            k=rng.randrange(15),
            v=round(rng.uniform(0, 100), 2),
            s=rng.choice(["a", "b", "c", None]),
        )
        for _ in range(800)
    ]
    return spark.createDataFrame(rows)


def _rows(df):
    # None-safe canonical ordering (NULLs sort before values)
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


def test_filter_splitting(frame):
    # σ(a ∧ b) == σ(a) ∘ σ(b)
    both = filter_rows(frame, ("k", "<", 10), ("v", ">", 25.0))
    chained = filter_rows(filter_rows(frame, ("k", "<", 10)), ("v", ">", 25.0))
    assert _rows(both) == _rows(chained)


def test_filter_complement_partitions_rows(frame):
    # σ(p) ⊎ σ(¬p) == all rows with non-null p
    p = filter_rows(frame, ("v", ">", 50.0))
    notp = filter_rows(frame, ("v", "<=", 50.0))
    assert p.count() + notp.count() == frame.filter(F.col("v").isNotNull()).count()


def test_join_commutativity(spark, frame):
    other = spark.createDataFrame([Row(rk=i, w=i * 10) for i in range(15)])
    ab = join_tables(frame, other, [("k", "=", "rk")]).select("k", "v", "s", "rk", "w")
    ba = join_tables(other, frame, [("rk", "=", "k")]).select("k", "v", "s", "rk", "w")
    assert _rows(ab) == _rows(ba)


def test_aggregate_over_union(spark, frame):
    # sum over a union == sum of sums (on exact decimal)
    half1 = frame.filter(F.col("k") < 8)
    half2 = frame.filter(F.col("k") >= 8)
    dec = F.col("v").cast("decimal(18,2)")
    total = frame.agg(F.sum(dec)).collect()[0][0]
    split = (
        half1.agg(F.sum(dec)).collect()[0][0] or 0
    ) + (half2.agg(F.sum(dec)).collect()[0][0] or 0)
    assert total == split


def test_union_all_counts(frame):
    u = set_op(frame, frame, "union_all")
    assert u.count() == 2 * frame.count()


def test_distinct_idempotent(frame):
    d1 = frame.select("k", "s").distinct()
    d2 = d1.distinct()
    assert _rows(d1) == _rows(d2)


def test_topk_subset_of_sorted(frame):
    top = frame.orderBy(F.col("v").desc()).limit(10).collect()
    vs = sorted((r.v for r in frame.collect()), reverse=True)[:10]
    assert sorted((r.v for r in top), reverse=True) == vs


# --------------------------------------------------------------------------
# CDC / merge / sessionize algebraic identities
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def kv_pair(spark):
    rng = random.Random(41)

    def snap(seed_shift):
        return spark.createDataFrame(
            [
                Row(k=i, a=rng.choice(["x", "y", "z", None]), b=rng.randrange(50))
                for i in range(120)
                if rng.random() < 0.8
            ]
        )

    return snap(0), snap(1)


def test_diff_then_apply_reconstructs(kv_pair):
    from parallel_dbms_spark.operators import apply_changes, snapshot_diff

    old, new = kv_pair
    diff = snapshot_diff(old, new, keys=["k"])
    rebuilt = apply_changes(old, diff, keys=["k"])
    assert _rows(rebuilt) == _rows(new)


def test_empty_diff_is_identity(kv_pair):
    from parallel_dbms_spark.operators import snapshot_diff

    old, _ = kv_pair
    assert snapshot_diff(old, old, keys=["k"]).count() == 0


def test_merge_upsert_idempotent(kv_pair):
    from parallel_dbms_spark.operators import merge_upsert

    tgt, src = kv_pair
    once = merge_upsert(tgt, src, keys=["k"])
    twice = merge_upsert(once, src, keys=["k"])
    assert _rows(once) == _rows(twice)


def test_sessionize_partitions_events_and_orders_sessions(spark):
    import datetime as dt

    from parallel_dbms_spark.operators import session_stats

    rng = random.Random(7)
    base = dt.datetime(2024, 3, 1)
    rows = [
        Row(
            event_id=i,
            user_id=rng.randrange(6),
            ts=base + dt.timedelta(minutes=rng.randrange(0, 3000)),
        )
        for i in range(400)
    ]
    ev = spark.createDataFrame(rows)
    stats = session_stats(ev, gap_minutes=30)
    # every event lands in exactly one session
    assert stats.agg(F.sum("n_events")).collect()[0][0] == 400
    # sessions of one user never overlap: sorted by start, each starts
    # > 30 min after the previous session's end
    for r in stats.groupBy("user_id").agg(
        F.collect_list(F.struct("session_start", "session_end")).alias("s")
    ).collect():
        spans = sorted((x.session_start, x.session_end) for x in r.s)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert (s2 - e1).total_seconds() > 30 * 60


# ---- round-3 operators: identities on seeded random frames ----------------


def _rand_frame(spark, seed, n=300, dup_keys=True):
    rng = random.Random(seed)
    rows = [
        Row(
            id=i,
            k=rng.randrange(8),
            v=round(rng.uniform(-50, 50), 2) if dup_keys else float(i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_ntile_distributed_equals_global_window_on_random_frames(spark, seed):
    from pyspark.sql import Window

    from parallel_dbms_spark.operators import ntile_distributed

    df = _rand_frame(spark, seed)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = ntile_distributed(df, order, n_buckets=7, num_partitions=5)
    want = df.withColumn("bucket", F.ntile(7).over(Window.orderBy(*order)))
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


@pytest.mark.parametrize("seed", [5, 23])
def test_fuzzy_pairs_bucketing_loses_no_pairs(spark, seed):
    # the exploded length-bucket equi-join must find EXACTLY the pairs
    # a brute-force cross check finds
    import itertools

    from parallel_dbms_spark.functions.dedup import fuzzy_pairs

    rng = random.Random(seed)
    words = ["graft", "graff", "craft", "spark", "spars", "sparse", "park"]
    rows = [
        Row(id=i, name=rng.choice(words) + rng.choice(["", "s"]))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs(df, "id", "name", max_dist=1).collect()
    }
    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]
    want = {
        (x.id, y.id)
        for x, y in itertools.combinations(rows, 2)
        if lev(x.name, y.name) <= 1
    }
    assert got == want


@pytest.mark.parametrize("seed", [7, 13])
def test_merged_intervals_are_disjoint_and_cover_all_positions(spark, seed):
    from parallel_dbms_spark.functions.dedup import merge_span_intervals

    rng = random.Random(seed)
    spans = [
        Row(doc_id=rng.randrange(5), pos=rng.randrange(1, 40))
        for _ in range(120)
    ]
    df = spark.createDataFrame(spans).dropDuplicates(["doc_id", "pos"])
    n = 6
    iv = merge_span_intervals(df, n=n).collect()
    flagged = {
        (r["doc_id"], r["pos"]) for r in df.collect()
    }
    by_doc = {}
    for r in iv:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, ivs in by_doc.items():
        ivs = sorted(ivs, key=lambda r: r["start_pos"])
        starts_in_doc = sorted(p for d, p in flagged if d == doc)
        # every flagged start position lies inside exactly one interval
        for p in starts_in_doc:
            hits = [
                r for r in ivs if r["start_pos"] <= p <= r["end_pos"]
            ]
            assert len(hits) >= 1
        # interval run-starts are flagged positions and runs don't
        # share start positions
        assert len({r["start_pos"] for r in ivs}) == len(ivs)
        for r in ivs:
            assert (doc, r["start_pos"]) in flagged
            assert r["end_pos"] == r["start_pos"] + r["n_tokens"] - 1


@pytest.fixture(scope="module")
def text_frame(spark):
    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        Row(
            doc_id=i,
            text=" ".join(rng.choices(vocab, k=rng.randrange(0, 30))),
        )
        for i in range(300)
    ]
    return spark.createDataFrame(rows)


@pytest.mark.parametrize("parts", [1, 7])
def test_heavy_hitters_partition_invariant_and_exact(text_frame, parts):
    # the two-pass top-k must not depend on the physical layout, and
    # must equal the exact groupBy top-k at any partitioning
    from parallel_dbms_spark.functions.frequency import heavy_hitters

    df = text_frame.repartition(parts)
    hh = [(r["term"], r["n"]) for r in heavy_hitters(df, k=8, cap=512).collect()]
    exact = [
        (r["term"], r["n"])
        for r in (
            df.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("term").asc())
            .limit(8)
            .collect()
        )
    ]
    assert hh == exact


def test_bigram_surprisal_partition_invariant(text_frame):
    from parallel_dbms_spark.functions.text import bigram_surprisal

    a = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_e6"])
        for r in bigram_surprisal(text_frame.repartition(1)).collect()
    }
    b = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_e6"])
        for r in bigram_surprisal(text_frame.repartition(9)).collect()
    }
    assert a == b and a  # identical, and non-empty


def test_bpe_apply_partition_invariant(text_frame):
    from parallel_dbms_spark.functions.bpe import apply_bpe, learn_bpe

    merges = learn_bpe(text_frame, n_merges=30)
    a = {
        r["doc_id"]: tuple(r["bpe_tokens"])
        for r in apply_bpe(text_frame.repartition(2), merges).collect()
    }
    b = {
        r["doc_id"]: tuple(r["bpe_tokens"])
        for r in apply_bpe(text_frame.repartition(11), merges).collect()
    }
    assert a == b


def test_semantic_dedup_survivors_partition_invariant(spark):
    import numpy as np

    from parallel_dbms_spark.functions.similarity import semantic_dedup

    rng = np.random.default_rng(41)
    rows = []
    for i in range(120):
        base = rng.normal(size=8)
        rows.append((i, [float(x) for x in base]))
        if i % 4 == 0:  # plant a near-dup of every 4th vector
            rows.append((1000 + i, [float(x) for x in base + rng.normal(size=8) * 1e-3]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = lambda d: sorted(
        r["id"] for r in semantic_dedup(d, threshold=0.95, nlist=4, iters=1).collect() if r["keep"]
    )
    assert kept(df.repartition(1)) == kept(df.repartition(13))


def test_stream_neardup_reference_partition_invariant(spark):
    from parallel_dbms_spark.streaming import neardup_reference_kept

    rng = random.Random(53)
    vocab = [f"tok{i}" for i in range(60)]
    base_docs = [" ".join(rng.choices(vocab, k=20)) for _ in range(40)]
    rows = []
    for i, t in enumerate(base_docs):
        rows.append(Row(doc_id=i, text=t))
        if i % 5 == 0:  # exact dup with higher id
            rows.append(Row(doc_id=100 + i, text=t))
    df = spark.createDataFrame(rows)
    kept = lambda d: sorted(r["doc_id"] for r in neardup_reference_kept(d).collect())
    k1 = kept(df.repartition(1))
    assert k1 == kept(df.repartition(7))
    # every planted exact dup is dropped, every original kept
    assert all(i in k1 for i in range(40))
    assert all(100 + i not in k1 for i in range(0, 40, 5))


def test_scd2_partition_invariant(spark):
    import datetime as dt

    from parallel_dbms_spark.operators import scd2_history

    rng = random.Random(17)
    rows = [
        Row(
            k=rng.randrange(12),
            ts=dt.datetime(2024, 1, 1 + rng.randrange(25)),
            seq=i,
            st=rng.choice(["A", "B", "C", None]),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)

    def hist(d):
        return sorted(
            (r.k, r.st or "-", r.valid_from, r.valid_to, r.is_current)
            for r in scd2_history(
                d, keys=["k"], ts_col="ts", attr_cols=["st"], tiebreak=["seq"]
            ).collect()
        )

    assert hist(df.repartition(1)) == hist(df.repartition(11))


def test_histogram_partition_invariant_exact(spark):
    from parallel_dbms_spark.functions.histogram import histogram_sketch

    rng = random.Random(23)
    df = spark.createDataFrame(
        [Row(x=rng.uniform(-10, 110)) for _ in range(3000)]
    )
    sk = lambda d: sorted(
        (r.bucket, r.cnt)
        for r in histogram_sketch(d, "x", 0.0, 100.0, 32).collect()
    )
    assert sk(df.repartition(1)) == sk(df.repartition(9))


def test_cms_partition_invariant_exact(spark):
    from parallel_dbms_spark.functions.frequency import cms_build

    rng = random.Random(29)
    df = spark.createDataFrame(
        [Row(term=f"t{rng.randrange(50)}") for _ in range(2000)]
    )
    sk = lambda d: sorted(
        (r.d, r.w, r.cnt) for r in cms_build(d, width=256).collect()
    )
    assert sk(df.repartition(1)) == sk(df.repartition(9))


def test_mv_rewrite_invariant_under_view_regrouping(spark, tmp_path):
    # Answering from a FINER view must equal answering from a coarser
    # one whenever both contain the question — re-aggregation is
    # associative on the stored measures.
    from parallel_dbms_spark.operators.mv import define_mv, mv_answer

    rng = random.Random(31)
    df = spark.createDataFrame(
        [
            Row(a=rng.randrange(4), b=rng.randrange(6), c=rng.randrange(3),
                v=rng.randrange(1000))
            for _ in range(2000)
        ]
    )
    fine, coarse = str(tmp_path / "fine"), str(tmp_path / "coarse")
    meas = {"s": ("sum", "v"), "n": ("count", "v"),
            "lo": ("min", "v"), "hi": ("max", "v")}
    define_mv(df, fine, ["a", "b", "c"], meas)
    define_mv(df, coarse, ["a", "b"], meas)
    want = {"s": ("sum", "v"), "n": ("count", "v"),
            "lo": ("min", "v"), "hi": ("max", "v"), "m": ("avg", "v")}
    f = sorted(tuple(r) for r in mv_answer(spark, fine, ["a"], want).collect())
    c = sorted(tuple(r) for r in mv_answer(spark, coarse, ["a"], want).collect())
    assert f == c
