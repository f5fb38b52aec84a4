"""Hypothesis property tests — machine-generated edge cases for the
operators whose invariants are algebraic (interval tiling, counter
linearity, merge idempotence), complementing the seeded-random
property suite with shrinking counterexamples.

Each example drives real Spark jobs, so examples are few and frames
small; Hypothesis spends its budget on STRUCTURE (duplicates, ties,
NULLs, singletons) rather than volume.
"""

from __future__ import annotations
import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


feed_rows = st.lists(
    st.tuples(
        st.integers(0, 3),                      # key
        st.integers(1, 20),                     # day (ties likely)
        st.sampled_from(["A", "B", None]),      # state incl. NULL
    ),
    min_size=1,
    max_size=25,
)


@given(rows=feed_rows)
@SETTINGS
def test_scd2_intervals_tile_and_have_one_current(spark, rows):
    from parallel_dbms_spark.operators import scd2_history

    # explicit schema: Hypothesis can generate an all-None ``st``
    # column, which defeats schema inference
    df = spark.createDataFrame(
        [
            Row(k=k, ts=dt.datetime(2024, 1, d), seq=i, st=s)
            for i, (k, d, s) in enumerate(rows)
        ],
        schema="k bigint, ts timestamp, seq bigint, st string",
    )
    out = scd2_history(
        df, keys=["k"], ts_col="ts", attr_cols=["st"], tiebreak=["seq"]
    ).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per key, and it is last
        assert sum(r.valid_to is None for r in ivs) == 1
        assert ivs[-1].valid_to is None and ivs[-1].is_current
        # intervals tile: no gaps, no overlaps
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
        # consecutive intervals always differ in state (collapsed)
        for a, b in zip(ivs, ivs[1:]):
            assert a.st != b.st or (a.st is None) != (b.st is None) or a.st != b.st


terms = st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60)


@given(ts=terms)
@SETTINGS
@pytest.mark.slow  # residual: CMS merge tests in test_operators_extra.py
def test_cms_split_merge_linearity_any_split(spark, ts):
    from parallel_dbms_spark.functions.frequency import cms_build, cms_merge

    df = spark.createDataFrame([Row(term=t, i=i) for i, t in enumerate(ts)])
    a, b = df.filter("i % 2 = 0"), df.filter("i % 2 = 1")
    whole = {(r.d, r.w): r.cnt for r in cms_build(df, width=64).collect()}
    parts = [cms_build(x, width=64) for x in (a, b) if not x.isEmpty()]
    merged = {(r.d, r.w): r.cnt for r in cms_merge(*parts).collect()}
    assert merged == whole


kv_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-3, 3)), min_size=1, max_size=20
)


@given(t_rows=kv_rows, s_rows=kv_rows)
@SETTINGS
@pytest.mark.slow  # residual: tests/test_tx_merge.py clause/upsert suites
def test_merge_upsert_source_wins_and_is_idempotent(spark, t_rows, s_rows):
    from parallel_dbms_spark.operators import merge_upsert

    t = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in dict(t_rows).items()]
    )
    s = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in dict(s_rows).items()]
    )
    once = merge_upsert(t, s, ["k"])
    twice = merge_upsert(once, s, ["k"])
    got_once = {r.k: r.v for r in once.collect()}
    got_twice = {r.k: r.v for r in twice.collect()}
    assert got_once == got_twice  # applying the same source again: no-op
    want = {**dict(t_rows), **dict(s_rows)}  # source wins on collision
    assert got_once == want


# token alphabet small enough that phrases repeat and overlap
_tok = st.sampled_from(["a", "b", "c", "ab"])
doc_corpus = st.lists(
    st.lists(_tok, min_size=0, max_size=12),  # token lists per doc
    min_size=1,
    max_size=8,
)
phrase_strategy = st.lists(_tok, min_size=1, max_size=3)


@given(docs_toks=doc_corpus, phrase_toks=phrase_strategy)
@SETTINGS
@pytest.mark.slow  # residual: tests/test_search.py + test_fuzz_search.py
def test_phrase_search_matches_python_reference(spark, docs_toks, phrase_toks):
    """phrase_search == a direct Python sliding-window count, for every
    generated corpus/phrase — incl. overlapping matches, repeated
    tokens inside the phrase, empty docs, and phrase-longer-than-doc."""
    from parallel_dbms_spark.functions.search import (
        conjunctive_search,
        phrase_search,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs_toks)],
        "doc_id long, text string",
    )
    phrase = " ".join(phrase_toks)
    got = {
        r["doc_id"]: r["n_matches"] for r in phrase_search(df, phrase).collect()
    }
    k = len(phrase_toks)
    want = {}
    for i, toks in enumerate(docs_toks):
        n = sum(
            1
            for s in range(len(toks) - k + 1)
            if toks[s : s + k] == phrase_toks
        )
        if n:
            want[i] = n
    assert got == want

    # phrase hit => doc contains all the phrase's terms (conjunctive
    # search is an upper bound on the phrase doc set)
    conj = {
        r["doc_id"]
        for r in conjunctive_search(df, list(set(phrase_toks))).collect()
    }
    assert set(got) <= conj


asof_rows = st.tuples(
    st.lists(  # left: (id, minute) — duplicates and ties encouraged
        st.tuples(st.integers(0, 30), st.integers(0, 60)),
        min_size=1,
        max_size=12,
    ),
    st.lists(  # right: (minute, value-id)
        st.integers(0, 60),
        min_size=0,
        max_size=8,
    ),
)


@given(data=asof_rows)
@SETTINGS
@pytest.mark.slow  # residual: tests/test_asof.py test_asof_matches_duckdb
def test_asof_nearest_matches_python_reference(spark, data):
    """nearest-direction as-of == a direct argmin-gap reference (ties ->
    backward), across generated ties, duplicates, empty right sides,
    and out-of-range left rows."""
    from parallel_dbms_spark.operators import asof_join

    left_rows, right_minutes = data
    right_minutes = sorted(set(right_minutes))
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (i, 1, base + dt.timedelta(minutes=m))
            for i, (_, m) in enumerate(left_rows)
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=m), float(m))
            for m in right_minutes
        ],
        "k long, rts timestamp, v double",
    ) if right_minutes else spark.createDataFrame(
        [], "k long, rts timestamp, v double"
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_values=["v"], direction="nearest", how="left",
    )
    got = {r["id"]: r["r_v"] for r in out.collect()}

    want = {}
    for i, (_, m) in enumerate(left_rows):
        if not right_minutes:
            want[i] = None
            continue
        best = min(right_minutes, key=lambda rm: (abs(rm - m), rm > m))
        want[i] = float(best)
    assert got == want


@given(data=asof_rows)
@SETTINGS
@pytest.mark.slow  # residual: tests/test_asof.py sharded==unsharded equivalences
def test_asof_sharded_nearest_matches_python_reference(spark, data):
    """The salted (time-range-sharded) as-of must satisfy the SAME
    argmin-gap reference as the unsharded plan — including when every
    row lands in one shard, shards are empty, or carries must cross
    several empty shards."""
    from parallel_dbms_spark.operators import asof_join_sharded

    left_rows, right_minutes = data
    right_minutes = sorted(set(right_minutes))
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (i, 1, base + dt.timedelta(minutes=m))
            for i, (_, m) in enumerate(left_rows)
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=m), float(m))
            for m in right_minutes
        ],
        "k long, rts timestamp, v double",
    ) if right_minutes else spark.createDataFrame(
        [], "k long, rts timestamp, v double"
    )
    out = asof_join_sharded(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_values=["v"], direction="nearest", how="left", n_shards=4,
    )
    got = {r["id"]: r["r_v"] for r in out.collect()}

    want = {}
    for i, (_, m) in enumerate(left_rows):
        if not right_minutes:
            want[i] = None
            continue
        best = min(right_minutes, key=lambda rm: (abs(rm - m), rm > m))
        want[i] = float(best)
    assert got == want
