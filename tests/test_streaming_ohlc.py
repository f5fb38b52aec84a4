"""Streaming OHLC sink: batch-split invariance and replay idempotence."""

from __future__ import annotations

import os
import tempfile


def _run(spark, sf_dir, n_files, root):
    from parallel_dbms_spark.streaming.sinks import read_ohlc, stream_ohlc_sink
    from parallel_dbms_spark.streaming.windows import read_events_stream

    events = read_events_stream(
        spark, sf_dir, staged=os.path.join(root, f"src{n_files}"),
        n_files=n_files, max_files_per_trigger=1,
    )
    stream_ohlc_sink(
        events,
        os.path.join(root, f"state{n_files}"),
        os.path.join(root, f"ckpt{n_files}"),
    )
    return read_ohlc(spark, os.path.join(root, f"state{n_files}"))


def test_ohlc_state_invariant_to_batch_split(spark):
    sf = "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="ohlc_split_")
    a = {tuple(r) for r in _run(spark, sf, 2, root).collect()}
    b = {tuple(r) for r in _run(spark, sf, 5, root).collect()}
    assert a == b and len(a) > 0


def test_ohlc_replay_is_idempotent(spark):
    from parallel_dbms_spark.streaming.sinks import read_ohlc, stream_ohlc_sink
    from parallel_dbms_spark.streaming.windows import read_events_stream

    sf = "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="ohlc_replay_")
    state = os.path.join(root, "state")

    def go(ckpt):
        ev = read_events_stream(
            spark, sf, staged=os.path.join(root, "src"),
            n_files=3, max_files_per_trigger=1,
        )
        stream_ohlc_sink(ev, state, os.path.join(root, ckpt))

    go("ckpt1")
    once = {tuple(r) for r in read_ohlc(spark, state).collect()}
    # a FRESH checkpoint replays every batch id from 0 — the
    # applied-batch marker must reject all of them (no double fold)
    go("ckpt2")
    twice = {tuple(r) for r in read_ohlc(spark, state).collect()}
    assert once == twice
