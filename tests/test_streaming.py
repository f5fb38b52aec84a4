"""Streaming == batch equivalence: each windowed aggregation driven as
a REAL Structured Streaming query (staged directory, availableNow
replay, memory sink) must equal its batch twin computed with the same
window functions on a plain DataFrame."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark import streaming


def _sym_diff(a, b):
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_tumbling_stream_equals_batch(spark):
    s = streaming.run_stream_to_batch(
        spark, streaming.tumbling_window_agg(streaming.read_events_stream(spark, SF_SMOKE))
    )
    b = streaming.tumbling_window_agg(_events(spark))  # batch: same code path, no watermark effect
    assert _sym_diff(s, b) == 0


def test_sliding_stream_equals_batch(spark):
    s = streaming.run_stream_to_batch(
        spark, streaming.sliding_window_agg(streaming.read_events_stream(spark, SF_SMOKE))
    )
    b = streaming.sliding_window_agg(_events(spark))
    assert _sym_diff(s, b) == 0
    # every event lands in exactly 2 windows (2h width / 1h slide)
    n_events = _events(spark).count()
    assert s.agg(F.sum("n_events")).collect()[0][0] == 2 * n_events


def test_session_stream_equals_batch(spark):
    s = streaming.run_stream_to_batch(
        spark, streaming.session_window_agg(streaming.read_events_stream(spark, SF_SMOKE))
    )
    b = streaming.session_window_agg(_events(spark))
    assert _sym_diff(s, b) == 0


def test_session_windows_respect_gap(spark):
    s = streaming.session_window_agg(_events(spark)).collect()
    for r in s:
        assert r.session_end > r.session_start
        # a session's span is at least (n_events-1)*0 and end = last+30m
        assert r.n_events >= 1
